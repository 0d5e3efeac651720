"""Plot benchmark results (replaces the reference's R/ggplot2 script).

Reads the benchmark/ds_stats CSVs written by ``run_benchmark.py`` and
produces the same views as ``scripts/plot_results.r:1-65``: accuracy per
dataset, boxplots of embedding/selection/doc-select/generate/e2e times,
and per-source retrieval duration; plus message-size stats (new).

    python scripts/plot_results.py --logs-dir data/logs --out plots/
"""

import argparse
import csv
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_benchmark_csv(path):
    rows = []
    with open(path) as f:
        for row in csv.DictReader(f):
            rows.append(row)
    return rows


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--logs-dir", type=str, default="data/logs")
    parser.add_argument("--out", type=str, default="data/plots")
    args = parser.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(args.out, exist_ok=True)

    bench_files = [f for f in os.listdir(args.logs_dir)
                   if f.startswith("benchmark_") and f.endswith(".csv")]
    if not bench_files:
        print(f"no benchmark CSVs under {args.logs_dir}")
        return

    time_cols = ["selection_time", "embedding_time", "doc_select_time",
                 "generate_time", "e2e_time"]

    for bf in sorted(bench_files):
        tag = bf[len("benchmark_"):-len(".csv")]
        rows = load_benchmark_csv(os.path.join(args.logs_dir, bf))
        if not rows:
            continue

        # accuracy per dataset (plot_results.r prints it)
        by_ds = defaultdict(list)
        for r in rows:
            by_ds[r["dataset"]].append(int(r["correct"]))
        for ds, vals in sorted(by_ds.items()):
            print(f"{tag} / {ds}: accuracy {sum(vals)}/{len(vals)} "
                  f"= {sum(vals) / len(vals):.3f}")

        # stage-time boxplots
        fig, ax = plt.subplots(figsize=(8, 4))
        data = [[float(r[c]) for r in rows if float(r[c]) >= 0]
                for c in time_cols]
        ax.boxplot(data, tick_labels=[c.replace("_time", "")
                                      for c in time_cols])
        ax.set_yscale("log")
        ax.set_ylabel("seconds (log)")
        ax.set_title(f"stage times — {tag}")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, f"times_{tag}.png"), dpi=120)
        plt.close(fig)

        # routed-source count histogram
        fig, ax = plt.subplots(figsize=(5, 3))
        counts = [int(r["num_data_sources"]) for r in rows]
        ax.hist(counts, bins=range(0, max(counts) + 2), align="left",
                rwidth=0.8)
        ax.set_xlabel("sources routed")
        ax.set_ylabel("queries")
        ax.set_title(f"routing fan-out — {tag}")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, f"fanout_{tag}.png"), dpi=120)
        plt.close(fig)

        # per-source duration boxplot from ds_stats
        ds_path = os.path.join(args.logs_dir, f"ds_stats_{tag}.csv")
        if os.path.exists(ds_path):
            per_source = defaultdict(list)
            sizes = defaultdict(list)
            with open(ds_path) as f:
                for r in csv.DictReader(f):
                    per_source[r["data_source"]].append(float(r["duration"]))
                    sizes[r["data_source"]].append(float(r["msg_size"]))
            names = sorted(per_source)
            if not names:   # routing=none: no sources queried
                continue
            fig, ax = plt.subplots(figsize=(8, 4))
            ax.boxplot([per_source[n] for n in names], tick_labels=names)
            ax.set_ylabel("retrieval duration (s)")
            ax.set_title(f"per-source retrieval — {tag}")
            plt.xticks(rotation=45, ha="right")
            fig.tight_layout()
            fig.savefig(os.path.join(args.out, f"sources_{tag}.png"), dpi=120)
            plt.close(fig)
            for n in names:
                print(f"  {n}: mean duration "
                      f"{sum(per_source[n]) / len(per_source[n]):.4f}s, "
                      f"mean msg {sum(sizes[n]) / len(sizes[n]):.0f}B")

    print(f"plots written to {args.out}")


if __name__ == "__main__":
    main()
