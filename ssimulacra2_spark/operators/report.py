"""Optional graph sink (≙ area-chart PNG render, video.rs:509-562).

matplotlib is not part of this container's baked environment, so the PNG
renderer is import-guarded; the CSV fallback keeps the sink functional.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame


def render_score_graph(series: DataFrame, out_path: str | None = None) -> str:
    """series: (frame, score) rows. Writes PNG if matplotlib is available,
    else CSV. Returns the written path (epoch-stamped like video.rs:513-518)."""
    rows = series.orderBy(series.columns[0]).collect()
    xs = [r[0] for r in rows]
    ys = [float(r[1]) for r in rows]
    stamp = int(time.time())
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        path = out_path or f"score_graph_{stamp}.png"
        fig, ax = plt.subplots(figsize=(10, 4))
        ax.fill_between(range(len(xs)), ys, alpha=0.4)
        ax.plot(range(len(xs)), ys)
        ax.set_ylabel("score")
        fig.savefig(path)
        plt.close(fig)
        return path
    except ImportError:
        path = out_path or f"score_graph_{stamp}.csv"
        with open(path, "w") as f:
            f.write("frame,score\n")
            for x, y in zip(xs, ys):
                f.write(f"{x},{y}\n")
        return path
