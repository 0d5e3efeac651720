"""Benchmark client for the federated search server.

Behavioral parity with the reference clients (``run_benchmark.py`` and
``run_benchmark_parallel.py``): iterates question banks in a frozen,
persisted order (``data/question_order_*.json``), resumes by skipping
question ids already logged, sends batches of ``--parallel`` concurrent
HTTP GETs, scores answers online, and appends four log files with
identical schemas:

* ``benchmark_<B>_<R>[_<Q>].csv``  — per-question row: benchmark, dataset,
  model, qid, correct, data_sources, num_data_sources, selection/embedding/
  doc_select/generate/e2e times, docs_tokens (reference run_benchmark.py:45)
* ``ds_stats_<B>_<R>[_<Q>].csv``   — per-(question, source): duration,
  msg_size (reference :49)
* ``answers_*.jsonl`` and ``top_docs_*.jsonl``

``--shard/--num-shards`` stripes questions across client instances
(reference run_benchmark_parallel.py:104).
"""

import argparse
import asyncio
import json
import os

import aiohttp

from ragroute_tpu.benchmark import Benchmark


async def fetch_answer(session, url):
    async with session.get(url) as response:
        if response.status == 200:
            return await response.json()
        print(f"Failed to fetch data: {response.status} - "
              f"{await response.text()}")
        return None


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Run a benchmark against ragroute-tpu.")
    parser.add_argument("--benchmark", type=str, default="MMLU",
                        choices=["MIRAGE", "FeB4RAG", "MMLU", "SYNTHETIC"])
    parser.add_argument("--benchmark-path", type=str,
                        default="data/benchmark")
    parser.add_argument("--save-logs-dir", dest="save_logs_dir", type=str,
                        default="data/logs")
    parser.add_argument("--parallel", type=int, default=1,
                        help="Number of parallel requests to send")
    parser.add_argument("--routing", type=str, required=True,
                        choices=["ragroute", "all", "random", "none"])
    parser.add_argument("--questions", type=str, default=None,
                        help="Restrict to one question bank")
    parser.add_argument("--shard", type=int, default=0,
                        help="This client's stripe index")
    parser.add_argument("--num-shards", type=int, default=1,
                        help="Total number of striped client instances")
    parser.add_argument("--server", type=str,
                        default="http://localhost:8000")
    return parser.parse_args(argv)


async def run(args) -> dict:
    os.makedirs(args.save_logs_dir, exist_ok=True)
    suffix = (f"{args.benchmark}_{args.routing}_{args.questions}"
              if args.questions else f"{args.benchmark}_{args.routing}")
    benchmark_file = os.path.join(args.save_logs_dir, f"benchmark_{suffix}.csv")
    ds_stats_file = os.path.join(args.save_logs_dir, f"ds_stats_{suffix}.csv")
    answer_file = os.path.join(args.save_logs_dir, f"answers_{suffix}.jsonl")
    top_docs_file = os.path.join(args.save_logs_dir, f"top_docs_{suffix}.jsonl")

    if not os.path.exists(benchmark_file):
        with open(benchmark_file, "w") as f:
            f.write("benchmark,dataset,model,question_id,correct,"
                    "data_sources,num_data_sources,selection_time,"
                    "embedding_time,doc_select_time,generate_time,e2e_time,"
                    "docs_tokens\n")
    if not os.path.exists(ds_stats_file):
        with open(ds_stats_file, "w") as f:
            f.write("benchmark,dataset,question_id,data_source,duration,"
                    "msg_size\n")

    # resume-by-skip (reference run_benchmark.py:52-58)
    existing_question_ids = set()
    with open(benchmark_file, "r") as f:
        for line in f.readlines()[1:]:
            parts = line.strip().split(",")
            if len(parts) > 3:
                existing_question_ids.add(parts[3])

    num_questions = 0
    num_correct = 0

    benchmark = Benchmark(args.benchmark_path, args.benchmark)
    async with aiohttp.ClientSession() as session:
        question_banks = sorted(benchmark.benchmark_data.keys())
        if args.questions is not None:
            question_banks = [args.questions]

        for question_bank in question_banks:
            questions = benchmark.benchmark_data[question_bank]
            # frozen question order (reference run_benchmark.py:75-86)
            order_dir = os.path.join(args.save_logs_dir, "..")
            order_path = os.path.join(
                args.save_logs_dir,
                f"question_order_{args.benchmark}_{question_bank}.json")
            if os.path.exists(order_path):
                with open(order_path) as f:
                    ordered_ids = json.load(f)
                question_items = [(qid, questions[qid])
                                  for qid in ordered_ids if qid in questions]
                print(f"Reusing saved question order from {order_path}")
            else:
                question_items = list(questions.items())
                with open(order_path, "w") as f:
                    json.dump([qid for qid, _ in question_items], f)
                print(f"Saved new question order to {order_path}")

            # stripe across client instances (run_benchmark_parallel.py:104)
            question_items = question_items[args.shard::args.num_shards]

            for i in range(0, len(question_items), args.parallel):
                raw_batch = question_items[i:i + args.parallel]
                batch = [(qid, qd) for qid, qd in raw_batch
                         if qid not in existing_question_ids]
                if not batch:
                    continue

                tasks = []
                for question_id, question_data in batch:
                    question = question_data["question"]
                    options = question_data["options"]
                    enc_q = aiohttp.helpers.quote(question)
                    enc_o = aiohttp.helpers.quote(json.dumps(options))
                    url = (f"{args.server}/query?q={enc_q}"
                           f"&choices={enc_o}&qid={question_id}")
                    tasks.append(fetch_answer(session, url))
                results = await asyncio.gather(*tasks)

                for (question_id, question_data), result in zip(batch, results):
                    if not result:
                        print("Error: No result returned from the server.")
                        continue
                    is_correct = benchmark.check(
                        question_data, result["answer"])
                    num_questions += 1
                    num_correct += int(bool(is_correct))

                    with open(answer_file, "a") as f:
                        f.write(json.dumps({
                            "question_id": question_id,
                            "answer": result["answer"]}) + "\n")
                    with open(top_docs_file, "a") as f:
                        f.write(json.dumps({
                            "question_id": question_id,
                            "top_docs": result["metadata"]["top_docs"],
                        }) + "\n")

                    md = result["metadata"]
                    data_sources = ":".join(md["data_sources"])
                    with open(benchmark_file, "a") as f:
                        f.write(
                            f"{args.benchmark},{question_bank},{md['llm']},"
                            f"{question_id},{int(bool(is_correct))},"
                            f"{data_sources},{len(md['data_sources'])},"
                            f"{md['selection_time']},{md['embedding_time']},"
                            f"{md['doc_select_time']},{md['generate_time']},"
                            f"{md['e2e_time']},{md['docs_tokens']}\n")
                    with open(ds_stats_file, "a") as f:
                        for ds, stats in md["data_sources_stats"].items():
                            f.write(f"{args.benchmark},{question_bank},"
                                    f"{question_id},{ds},{stats['duration']},"
                                    f"{stats['message_size']}\n")

                    if args.benchmark in ("MIRAGE", "SYNTHETIC"):
                        print(f"--> Score: {num_correct}/{num_questions}")

    return {"questions": num_questions, "correct": num_correct,
            "benchmark_file": benchmark_file}


def main(argv=None):
    args = parse_args(argv)
    return asyncio.run(run(args))


if __name__ == "__main__":
    main()
