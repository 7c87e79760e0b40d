"""Serving benchmark client: TTFT / TTFP / E2E / RTF.

Counterpart of the reference's benchmark harness (reference
vllm_omni/benchmarks/serve.py + benchmarks/metrics/metrics.py and the
qwen3-tts/qwen3-omni benchmark READMEs): drives a running OmniAPIServer
with concurrent speech/chat requests and reports

  TTFT  - time to first token (chat SSE)
  TTFP  - time to first audio packet (speech chunked HTTP)
  E2E   - request completion time
  RTF   - real-time factor (generation time / audio seconds)

Usage:
  python benchmarks/serve_bench.py --base-url http://127.0.0.1:8000 \
      --mode speech --num-prompts 20 --concurrency 4
"""

from __future__ import annotations

import argparse
import asyncio
import json
import statistics
import time

import aiohttp

PROMPTS = [
    "The quick brown fox jumps over the lazy dog.",
    "TPUs stream audio tokens with very low latency.",
    "Paged attention keeps the cache tidy.",
    "Hello from the benchmark harness!",
]


async def speech_request(session, base, text, sample_rate=24000):
    t0 = time.perf_counter()
    ttfp = None
    pcm_bytes = 0
    async with session.post(
        f"{base}/v1/audio/speech",
        json={"input": text, "response_format": "pcm", "stream": True},
    ) as resp:
        resp.raise_for_status()
        async for chunk in resp.content.iter_chunked(4096):
            if ttfp is None and chunk:
                ttfp = time.perf_counter() - t0
            pcm_bytes += len(chunk)
    e2e = time.perf_counter() - t0
    audio_s = pcm_bytes / 2 / sample_rate
    return {
        "ttfp": ttfp or e2e,
        "e2e": e2e,
        "audio_s": audio_s,
        "rtf": e2e / audio_s if audio_s else float("inf"),
    }


async def chat_request(session, base, text, max_tokens=64):
    t0 = time.perf_counter()
    ttft = None
    tokens = 0
    async with session.post(
        f"{base}/v1/chat/completions",
        json={
            "messages": [{"role": "user", "content": text}],
            "max_tokens": max_tokens,
            "temperature": 0.0,
            "stream": True,
        },
    ) as resp:
        resp.raise_for_status()
        async for raw in resp.content:
            line = raw.decode().strip()
            if not line.startswith("data: ") or "[DONE]" in line:
                continue
            event = json.loads(line[6:])
            delta = event["choices"][0]["delta"].get("content")
            if delta:
                tokens += 1
                if ttft is None:
                    ttft = time.perf_counter() - t0
    e2e = time.perf_counter() - t0
    return {"ttft": ttft or e2e, "e2e": e2e, "tokens": tokens}


def _pct(vals, p):
    vals = sorted(vals)
    return vals[min(len(vals) - 1, int(p / 100 * len(vals)))]


async def run(args):
    results = []
    sem = asyncio.Semaphore(args.concurrency)

    async with aiohttp.ClientSession() as session:
        async def one(i):
            text = PROMPTS[i % len(PROMPTS)]
            async with sem:
                if args.mode == "speech":
                    return await speech_request(session, args.base_url, text)
                return await chat_request(
                    session, args.base_url, text, args.max_tokens
                )

        t0 = time.perf_counter()
        results = await asyncio.gather(
            *[one(i) for i in range(args.num_prompts)]
        )
        wall = time.perf_counter() - t0

    report: dict = {
        "mode": args.mode,
        "num_prompts": args.num_prompts,
        "concurrency": args.concurrency,
        "wall_s": round(wall, 3),
    }
    for key in results[0]:
        vals = [r[key] for r in results]
        report[f"{key}_mean"] = round(statistics.mean(vals), 4)
        report[f"{key}_p99"] = round(_pct(vals, 99), 4)
    print(json.dumps(report))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base-url", default="http://127.0.0.1:8000")
    p.add_argument("--mode", choices=["speech", "chat"], default="speech")
    p.add_argument("--num-prompts", type=int, default=20)
    p.add_argument("--concurrency", type=int, default=4)
    p.add_argument("--max-tokens", type=int, default=64)
    asyncio.run(run(p.parse_args()))


if __name__ == "__main__":
    main()
