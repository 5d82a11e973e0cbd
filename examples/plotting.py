"""Plot fitness curves from one or more runs (reference: examples/plotting.py).

Run:  python examples/plotting.py RUN_DIR [RUN_DIR ...] [--out fitness.png]
"""

import argparse

import _bootstrap  # noqa: F401

import pandas as pd

from evosoro_tpu.evo.data_analysis import get_all_data, plot_time_series


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dirs", nargs="+")
    ap.add_argument("--out", default="fitness.png")
    ap.add_argument("--metric", default="fitness")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    frames = []
    for i, d in enumerate(args.run_dirs):
        df = get_all_data(d)
        if df.empty:
            print(f"no data in {d}")
            continue
        df["condition"] = d
        df["run"] = i
        frames.append(df)
    if not frames:
        raise SystemExit("no data found")
    plot_time_series(pd.concat(frames, ignore_index=True),
                     metric=args.metric, save_path=args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
