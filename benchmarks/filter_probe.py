"""Measure IE_TPU_DEVICE_FILTERS: the batched device filter kernel
(ops/filter_kernel.py via filter_chat_host) vs the incremental host
Python filters, on N synthetic chat streams (VERDICT r2 next #6).

Run: python benchmarks/filter_probe.py  (uses the real TPU if available)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("N", 4096))
CHUNK = int(os.environ.get("CHUNK", 24))


def make_stream(i):
    body = (f"thinking about item {i} ... "
            f"<out>answer {i} alpha</out> filler text "
            f"<hide>secret {i}</hide> more prose "
            f"<out>answer {i} beta</out> tail")
    return body * 2


def run_host_incremental(streams):
    from interpolation_engine_tpu.core.filters import (InvertedFilter,
                                                       OutputFilter)
    results = []
    for raw in streams:
        extract = OutputFilter("<out>", "</out>", enumerate_outputs=True)
        hide = InvertedFilter("<hide>", "</hide>")
        visual = []
        for k in range(0, len(raw), CHUNK):
            visual.append(hide(extract(raw[k:k + CHUNK])))
        results.append((list(extract.outputs), "".join(visual)))
    return results


def run_device(streams):
    from interpolation_engine_tpu.ops.filter_kernel import filter_chat_host
    return [filter_chat_host(raw, "<out>", "</out>", "<hide>", "</hide>",
                             True) for raw in streams]


def main():
    import jax
    streams = [make_stream(i) for i in range(N)]
    platform = jax.devices()[0].platform

    t0 = time.perf_counter(); run_device(streams[:8])  # compile
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter(); dev = run_device(streams)
    dev_s = time.perf_counter() - t0
    t0 = time.perf_counter(); host = run_host_incremental(streams)
    host_s = time.perf_counter() - t0
    mismatch = sum(1 for d, h in zip(dev, host) if d[0] != h[0])
    print(f"platform={platform} n={N} len={len(streams[0])}B "
          f"compile={compile_s:.1f}s")
    print(f"device_kernel={dev_s:.3f}s ({N / dev_s:.0f} streams/s)  "
          f"host_incremental={host_s:.3f}s ({N / host_s:.0f} streams/s)  "
          f"speedup={host_s / dev_s:.2f}x  output_mismatches={mismatch}")


if __name__ == "__main__":
    main()
