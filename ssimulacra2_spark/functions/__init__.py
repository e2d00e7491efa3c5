"""Vectorized expression/UDF building blocks (Column expressions first;
pandas/Arrow UDFs only for the genuinely non-relational kernels)."""
