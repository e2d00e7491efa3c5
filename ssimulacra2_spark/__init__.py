"""ssimulacra2_spark — a PySpark-native schema & constraint validation engine.

A from-scratch engine over tables of multi-turn transcripts
``(conv_id, turn_idx, role, text, tool, ts)``: column stats, uniqueness,
referential integrity, distribution drift, per-partition pass/fail verdicts
plus violation rows with lineage, resumable from checkpoint.

Computational semantics derive from the rust-av/ssimulacra2 reference
(see SURVEY.md): paired snapshot comparison (source vs distorted image,
/root/reference/ssimulacra2/src/lib.rs:37-55), windowed local moments
(lib.rs:95-105), added/missing violation classes (lib.rs:281-289),
L1/L4 norms (lib.rs:245-250), multi-scale rollup (lib.rs:68-113) and a
weighted calibrated 0-100 health score (lib.rs:344-487). The architecture
is idiomatic Spark: DataFrame aggregations + vectorized pandas/Arrow UDFs
only — never per-row Python.
"""

__version__ = "0.1.0"
