"""Benchmark client for the federated search server.

Keeps the reference clients' on-disk contract (``run_benchmark.py:45-58``,
``run_benchmark_parallel.py:104``) — same URL query protocol, same four log
files with byte-identical schemas, frozen persisted question orders,
resume-by-skip, and ``--shard/--num-shards`` striping — but is built
differently: the client first materializes a work plan (ordered, striped,
resume-filtered question list per bank), then drains it through a bounded
pool of async workers. Unlike the reference's gather-per-chunk loop, the
pool keeps exactly ``--parallel`` requests in flight at all times, so one
slow query never stalls its whole chunk.

Log files (append-only, header written once):

* ``benchmark_<B>_<R>[_<Q>].csv``  — one row per question: correctness,
  routing fan-out, and per-stage times.
* ``ds_stats_<B>_<R>[_<Q>].csv``   — one row per (question, source).
* ``answers_<...>.jsonl`` / ``top_docs_<...>.jsonl`` — raw model output.
"""

from __future__ import annotations

import argparse
import asyncio
import dataclasses
import json
import os
import urllib.parse
from typing import Iterator, Optional, TextIO, Tuple

import aiohttp

from ragroute_tpu.benchmark import Benchmark

BENCHMARK_HEADER = (
    "benchmark,dataset,model,question_id,correct,data_sources,"
    "num_data_sources,selection_time,embedding_time,doc_select_time,"
    "generate_time,e2e_time,docs_tokens\n")
DS_STATS_HEADER = (
    "benchmark,dataset,question_id,data_source,duration,msg_size\n")

# benchmarks whose answers are scored online and worth a progress line
SCORED_LIVE = ("MIRAGE", "SYNTHETIC")


@dataclasses.dataclass
class WorkItem:
    """One question to ask the server."""

    bank: str
    qid: str
    data: dict


@dataclasses.dataclass
class LogSink:
    """The four append-only log files; owns header creation and the
    resume set parsed from a previous run's benchmark CSV."""

    benchmark_csv: TextIO
    ds_stats_csv: TextIO
    answers: TextIO
    top_docs: TextIO
    seen_qids: set

    @classmethod
    def open(cls, logs_dir: str, suffix: str) -> "LogSink":
        os.makedirs(logs_dir, exist_ok=True)

        def path(stem: str, ext: str) -> str:
            return os.path.join(logs_dir, f"{stem}_{suffix}.{ext}")

        seen = set()
        bench_path = path("benchmark", "csv")
        if os.path.exists(bench_path):
            with open(bench_path) as f:
                for row in list(f)[1:]:
                    cells = row.rstrip("\n").split(",")
                    if len(cells) > 3:
                        seen.add(cells[3])

        def appender(p: str, header: Optional[str]) -> TextIO:
            fresh = not os.path.exists(p)
            fh = open(p, "a")
            if fresh and header:
                fh.write(header)
                fh.flush()
            return fh

        return cls(
            benchmark_csv=appender(bench_path, BENCHMARK_HEADER),
            ds_stats_csv=appender(path("ds_stats", "csv"), DS_STATS_HEADER),
            answers=appender(path("answers", "jsonl"), None),
            top_docs=appender(path("top_docs", "jsonl"), None),
            seen_qids=seen,
        )

    def close(self) -> None:
        for fh in (self.benchmark_csv, self.ds_stats_csv,
                   self.answers, self.top_docs):
            fh.close()

    def record(self, benchmark: str, item: WorkItem, correct: bool,
               reply: dict) -> None:
        md = reply["metadata"]
        self.answers.write(json.dumps(
            {"question_id": item.qid, "answer": reply["answer"]}) + "\n")
        self.top_docs.write(json.dumps(
            {"question_id": item.qid, "top_docs": md["top_docs"]}) + "\n")
        self.benchmark_csv.write(",".join(str(v) for v in (
            benchmark, item.bank, md["llm"], item.qid, int(correct),
            ":".join(md["data_sources"]), len(md["data_sources"]),
            md["selection_time"], md["embedding_time"],
            md["doc_select_time"], md["generate_time"], md["e2e_time"],
            md["docs_tokens"],
        )) + "\n")
        for source, stats in md["data_sources_stats"].items():
            self.ds_stats_csv.write(",".join(str(v) for v in (
                benchmark, item.bank, item.qid, source,
                stats["duration"], stats["message_size"],
            )) + "\n")
        for fh in (self.benchmark_csv, self.ds_stats_csv,
                   self.answers, self.top_docs):
            fh.flush()


def frozen_order(logs_dir: str, benchmark: str, bank: str,
                 questions: dict) -> list:
    """Persist (or reuse) this bank's question order so reruns and striped
    clients agree on it."""
    path = os.path.join(
        logs_dir, f"question_order_{benchmark}_{bank}.json")
    if os.path.exists(path):
        with open(path) as f:
            order = [qid for qid in json.load(f) if qid in questions]
        print(f"Reusing saved question order from {path}")
    else:
        order = list(questions)
        with open(path, "w") as f:
            json.dump(order, f)
        print(f"Saved new question order to {path}")
    return order


def build_plan(bench: Benchmark, args, seen: set) -> Iterator[WorkItem]:
    """Ordered, striped, resume-filtered stream of questions to ask."""
    banks = sorted(bench.benchmark_data)
    if args.questions is not None:
        banks = [args.questions]
    for bank in banks:
        questions = bench.benchmark_data[bank]
        order = frozen_order(args.save_logs_dir, args.benchmark, bank,
                             questions)
        for qid in order[args.shard::args.num_shards]:
            if qid not in seen:
                yield WorkItem(bank=bank, qid=qid, data=questions[qid])


def query_url(server: str, item: WorkItem) -> str:
    params = urllib.parse.urlencode({
        "q": item.data["question"],
        "choices": json.dumps(item.data["options"]),
        "qid": item.qid,
    })
    return f"{server}/query?{params}"


class BenchmarkClient:
    """Drains a work plan through ``parallel`` concurrent HTTP workers."""

    def __init__(self, args):
        self.args = args
        self.bench = Benchmark(args.benchmark_path, args.benchmark)
        self.asked = 0
        self.correct = 0

    async def _ask(self, session: aiohttp.ClientSession,
                   item: WorkItem) -> Optional[dict]:
        async with session.get(query_url(self.args.server, item)) as resp:
            if resp.status != 200:
                print(f"Failed to fetch data: {resp.status} - "
                      f"{await resp.text()}")
                return None
            return await resp.json()

    async def _worker(self, session: aiohttp.ClientSession,
                      queue: "asyncio.Queue[WorkItem]",
                      sink: LogSink, lock: asyncio.Lock) -> None:
        while True:
            item = await queue.get()
            try:
                # a worker must survive ANY per-item failure (timeout,
                # malformed reply, scorer error): a dead worker would
                # leave the queue undrained and hang queue.join() forever
                try:
                    reply = await self._ask(session, item)
                    if reply is None:
                        print("Error: No result returned from the server.")
                        continue
                    is_correct = bool(
                        self.bench.check(item.data, reply["answer"]))
                except asyncio.CancelledError:
                    raise
                except Exception as e:
                    print(f"Error: question {item.qid} failed: {e!r}")
                    continue
                async with lock:
                    self.asked += 1
                    self.correct += int(is_correct)
                    sink.record(self.args.benchmark, item, is_correct,
                                reply)
                    if self.args.benchmark in SCORED_LIVE:
                        print(f"--> Score: {self.correct}/{self.asked}")
            finally:
                queue.task_done()

    async def run(self) -> dict:
        args = self.args
        suffix = "_".join(
            p for p in (args.benchmark, args.routing, args.questions) if p)
        sink = LogSink.open(args.save_logs_dir, suffix)
        lock = asyncio.Lock()
        queue: "asyncio.Queue[WorkItem]" = asyncio.Queue(
            maxsize=2 * args.parallel)
        try:
            async with aiohttp.ClientSession() as session:
                workers = [
                    asyncio.create_task(
                        self._worker(session, queue, sink, lock))
                    for _ in range(max(1, args.parallel))
                ]
                for item in build_plan(self.bench, args, sink.seen_qids):
                    await queue.put(item)
                await queue.join()
                for w in workers:
                    w.cancel()
        finally:
            sink.close()
        return {"questions": self.asked, "correct": self.correct,
                "benchmark_file": sink.benchmark_csv.name}


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
    """Drive a full client run inside an existing event loop."""
    return await BenchmarkClient(args).run()


def main(argv=None):
    return asyncio.run(BenchmarkClient(parse_args(argv)).run())


if __name__ == "__main__":
    main()
