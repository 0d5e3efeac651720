"""HTTP load generator: sustained closed-loop throughput of /query.

Floods the federation server with ``--concurrency`` in-flight requests for
``--seconds``, cycling through the synthetic query ids (so the precomputed
embedding table is hit, like the benchmark clients do), then prints one
JSON line: achieved q/s, latency percentiles, and the server's /stats
snapshot (device_step_ms vs host-side stage times).

    python scripts/http_load.py --server http://127.0.0.1:8321 \
        --qids-path /tmp/vdata/medrag/queries/qids.json --seconds 20
"""

import argparse
import asyncio
import json
import time

import aiohttp

CHOICES = json.dumps({"A": "x", "B": "y"})


async def worker(session, server, qids, stop_at, lat, counts):
    while time.time() < stop_at:
        counts["launched"] += 1
        qid = qids[counts["launched"] % len(qids)]
        t0 = time.perf_counter()
        try:
            async with session.get(
                f"{server}/query",
                params={"q": f"load {qid}", "choices": CHOICES,
                        "qid": qid}) as resp:
                await resp.read()
                if resp.status == 200:
                    counts["ok"] += 1
                    lat.append(time.perf_counter() - t0)
                else:
                    counts["err"] += 1
        except aiohttp.ClientError:
            counts["err"] += 1


async def bulk_worker(session, server, qids, stop_at, lat, counts, bulk):
    """Closed-loop worker over POST /query/batch: `bulk` queries/request.

    Latency recorded per REQUEST (a bulk round trip); ok counts per QUERY
    so qps stays comparable with the single-query mode."""
    while time.time() < stop_at:
        base = counts["launched"]
        counts["launched"] += bulk
        body = {"queries": [
            {"q": f"load {qids[(base + j) % len(qids)]}",
             "choices": CHOICES, "qid": qids[(base + j) % len(qids)]}
            for j in range(bulk)]}
        t0 = time.perf_counter()
        try:
            async with session.post(f"{server}/query/batch",
                                    json=body) as resp:
                data = await resp.json() if resp.status == 200 else None
                if data is not None:
                    n_ok = sum(1 for r in data["results"]
                               if "error" not in r)
                    counts["ok"] += n_ok
                    counts["err"] += bulk - n_ok
                    lat.append(time.perf_counter() - t0)
                else:
                    counts["err"] += bulk
        except aiohttp.ClientError:
            counts["err"] += bulk


async def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--server", default="http://127.0.0.1:8321")
    ap.add_argument("--qids-path", required=True)
    ap.add_argument("--concurrency", type=int, default=512)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--warmup-seconds", type=float, default=5.0)
    ap.add_argument("--bulk", type=int, default=0,
                    help="queries per request via POST /query/batch "
                         "(0 = single-query GET /query mode)")
    args = ap.parse_args()

    with open(args.qids_path) as f:
        qids = json.load(f)

    def spawn(session, stop, lat, counts):
        if args.bulk > 0:
            return [bulk_worker(session, args.server, qids, stop, lat,
                                counts, args.bulk)
                    for _ in range(args.concurrency)]
        return [worker(session, args.server, qids, stop, lat, counts)
                for _ in range(args.concurrency)]

    conn = aiohttp.TCPConnector(limit=args.concurrency)
    async with aiohttp.ClientSession(connector=conn) as session:
        # warmup phase (not measured)
        lat, counts = [], {"launched": 0, "ok": 0, "err": 0}
        stop = time.time() + args.warmup_seconds
        await asyncio.gather(*spawn(session, stop, lat, counts))

        lat, counts = [], {"launched": 0, "ok": 0, "err": 0}
        t0 = time.time()
        stop = t0 + args.seconds
        await asyncio.gather(*spawn(session, stop, lat, counts))
        elapsed = time.time() - t0

        async with session.get(f"{args.server}/stats") as resp:
            stats = await resp.json()

    lat.sort()
    n = len(lat)
    print(json.dumps({
        "qps": round(counts["ok"] / elapsed, 1),
        "ok": counts["ok"],
        "errors": counts["err"],
        "latency_ms": {
            "p50": round(lat[n // 2] * 1e3, 1) if n else None,
            "p95": round(lat[min(n - 1, int(n * 0.95))] * 1e3, 1)
            if n else None,
        },
        "server_stats": {
            "batch_size": stats.get("batch_size", {}),
            "device_step_ms": stats.get("device_step_ms", {}),
            "e2e_p50_s": stats.get("stages_s", {}).get("e2e", {}).get("p50"),
        },
    }))


if __name__ == "__main__":
    asyncio.run(main())
