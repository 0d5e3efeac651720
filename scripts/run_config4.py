"""BASELINE config #4 artifact: the full benchmark suite, served,
batched-parallel, across all four routing modes.

Reproduces the reference's measurement pipeline end to end
(``/root/reference/run_benchmark.py:12-160`` + ``scripts/plot_results.r``)
against this framework's served system:

  data -> router training -> serve -> parallel HTTP benchmark client
  (frozen question orders, resume-by-skip CSVs) -> plots

Suites (synthetic stand-ins — the reference's MIRAGE.json blob and NFS
corpora are absent from its snapshot, ``.MISSING_LARGE_BLOBS``, and
``cais/mmlu`` needs network egress):

* MIRAGE  — the MedRAG world; a 5-bank MIRAGE.json (medqa, medmcqa,
  pubmedqa, bioasq, mmlu) in the reference's exact schema.
* FeB4RAG — the FeB4RAG world; FeB4RAG.jsonl (_id/text rows) whose qids
  match the world's synthetic qrels, so the oracle rerank engages.
* MMLU    — the wikipedia world; served + benched via the SYNTHETIC
  bank (the HF ``cais/mmlu`` loader is gated on egress; documented).

Usage:
  JAX_PLATFORM_NAME=cpu python scripts/run_config4.py \
      --out artifacts/config4 [--questions 48] [--parallel 8]
"""

import argparse
import asyncio
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROUTINGS = ["ragroute", "all", "random", "none"]
MIRAGE_BANKS = ["medqa", "medmcqa", "pubmedqa", "bioasq", "mmlu"]


def build_world(root, name, questions, docs):
    from ragroute_tpu.index.synthetic import make_synthetic_world, save_world

    syn = make_synthetic_world(name, docs_per_source=docs,
                               num_queries=questions, seed=11)
    save_world(syn, root)
    wroot = os.path.join(root, name)
    bdir = os.path.join(wroot, "benchmark")
    if name == "medrag":
        # multi-bank MIRAGE.json in the reference schema (round-robin
        # assignment keeps every bank populated)
        data = {b: {} for b in MIRAGE_BANKS}
        for i, q in enumerate(syn.questions):
            data[MIRAGE_BANKS[i % len(MIRAGE_BANKS)]][q["qid"]] = {
                "question": q["question"], "options": q["options"],
                "answer": q["answer"]}
        with open(os.path.join(bdir, "MIRAGE.json"), "w") as f:
            json.dump(data, f)
    if name == "feb4rag":
        with open(os.path.join(bdir, "FeB4RAG.jsonl"), "w") as f:
            for q in syn.questions:
                f.write(json.dumps(
                    {"_id": q["qid"], "text": q["question"]}) + "\n")
    return wroot


def train(root, name):
    import subprocess

    env = dict(os.environ, RAGROUTE_DATA=root, JAX_PLATFORM_NAME="cpu")
    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(__file__),
                                 "train_router.py"),
                    "--dataset", name, "--epochs", "8"],
                   check=True, env=env,
                   cwd=os.path.join(os.path.dirname(__file__), ".."))


async def bench_one(root, dataset, benchmark, routing, logs_dir, parallel):
    import run_benchmark
    from ragroute_tpu.system import ServingSystem

    args = argparse.Namespace(
        dataset=dataset, routing=routing, disable_llm=True,
        simulate=False, model="llama3.1-8B-instruct", data_root=root,
        port=0, dtype="bfloat16", impl="auto", buckets=(8, 32))
    system = ServingSystem(args)
    await system.start()
    try:
        port = system.server.bound_port
        bargs = run_benchmark.parse_args([
            "--benchmark", benchmark,
            "--benchmark-path",
            os.path.join(root, dataset, "benchmark"),
            "--save-logs-dir", logs_dir,
            "--routing", routing,
            "--parallel", str(parallel),
            "--server", f"http://127.0.0.1:{port}",
        ])
        return await run_benchmark.run(bargs)
    finally:
        await system.stop()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="artifacts/config4")
    p.add_argument("--data-root", default="/tmp/config4_data")
    p.add_argument("--questions", type=int, default=48)
    p.add_argument("--docs", type=int, default=2048)
    p.add_argument("--parallel", type=int, default=8)
    args = p.parse_args()

    root = args.data_root
    logs = os.path.join(args.out, "logs")
    os.makedirs(logs, exist_ok=True)
    summary = {}
    suites = [("medrag", "MIRAGE"), ("feb4rag", "FeB4RAG"),
              ("wikipedia", "SYNTHETIC")]
    for dataset, benchmark in suites:
        print(f"== building {dataset} world", flush=True)
        build_world(root, dataset, args.questions, args.docs)
        print(f"== training {dataset} router", flush=True)
        train(root, dataset)
        for routing in ROUTINGS:
            print(f"== serving {dataset}, benchmark {benchmark}, "
                  f"routing={routing}", flush=True)
            stats = asyncio.run(bench_one(
                root, dataset, benchmark, routing, logs, args.parallel))
            summary[f"{dataset}/{benchmark}/{routing}"] = stats
            print("   ", stats, flush=True)

    import subprocess

    plots = os.path.join(args.out, "plots")
    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(__file__),
                                 "plot_results.py"),
                    "--logs-dir", logs, "--out", plots], check=True)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(json.dumps(summary, indent=1, sort_keys=True))


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    main()
