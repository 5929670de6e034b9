"""Static capacities of the device VM (shapes are compile-time constants).

Everything on the device is fixed-shape: strings live in padded uint8
buffers, the insert store has a fixed number of slots, etc. Overflowing any
capacity parks the instance for host rescue (status=OVERFLOW) rather than
corrupting state. Capacities are tuned per batch size by the driver.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class VMConfig:
    max_str: int = 512        # working string buffer length (bytes)
    max_key: int = 64         # max insert-key length (bytes)
    n_slots: int = 48         # insert table slots
    arena_size: int = 8192    # per-instance byte arena
    pool_size: int = 96       # list-element pool entries
    out_size: int = 4096      # output buffer bytes
    max_loops: int = 8        # concurrently-nested for-loop counters
    max_subst: int = 16       # interpolation substitutions per string
    max_stars: int = 7        # wildcard '*' groups per pattern
    max_fix: int = 24         # replace_map repeat_until_done iterations
    max_list: int = 48        # max elements manipulated per list op
    max_threads: int = 8      # parallel_wait/race thread lanes per instance

    def smaller(self, **kw):
        from dataclasses import replace
        return replace(self, **kw)


DEFAULT = VMConfig()

# Engine-selection env vars (read by vm/driver.py / chat/service.py):
#   IE_TPU_MODE=jit|eager      — general-VM dispatch mode (auto otherwise)
#   IE_TPU_TURBO=1|0           — force/skip the turbo kernel in the CLI
#   IE_TPU_PALLAS=1|interpret  — Pallas brace scan in the interp kernel
#   IE_TPU_DEVICE_FILTERS=1    — batch chat-filter fast path
#   IE_TPU_KERNEL_CACHE=0      — disable the AOT kernel-executable cache
#   IE_TPU_KERNEL_CACHE_DIR    — cache dir (default ~/.cache/ie_tpu_kernels);
#     kernels cost minutes to ~40 min per process before the first step
#     (trace + Mosaic/XLA compile), and jax's persistent compilation
#     cache never hits because the lowered module bytes are process-
#     nondeterministic — both engines therefore persist the COMPILED
#     executable (jax.experimental.serialize_executable) keyed by program
#     content + config + shapes + source hashes, and later processes
#     deserialize-and-load in seconds (vm/aotcache.py)
#
# Both opt-in kernels were measured on the real v5e (2026-08-17, VERDICT
# r2 next #6) and LOSE at their call granularities, so they default OFF:
#   * IE_TPU_PALLAS=1 general-engine adventure bench: 64.3k vs 67.5k
#     tasks/s baseline (-5%) — the brace scan isn't the bottleneck; the
#     general VM is dominated by per-op dispatch, and the separate
#     pallas_call adds a launch per interpolation step.
#   * IE_TPU_DEVICE_FILTERS=1: ~0.4s per stream on axon (per-call remote
#     dispatch of a byte-granular scan) vs ~0.1ms for the incremental
#     Python filters (benchmarks/filter_probe.py; semantics verified
#     exact at the chunk->0 limit). Worth revisiting only if filtering
#     ever becomes a >1k-streams-per-launch batch operation.
# The flagship TPU path is the turbo mega-kernel, which subsumes both.

# Instance status codes
RUNNING = 0
DONE = 1
PARKED = 2    # waiting for host IO (park_kind says why)
ERROR = 3
OVERFLOW = 4  # capacity exceeded; host rescue required

# Park kinds (host ring request types)
PARK_USER_INPUT = 1
PARK_USER_CHOICE = 2
PARK_AWAIT_INSERT = 3
PARK_CHAT = 4
PARK_WRITE = 5
PARK_SPEAK = 6
PARK_SHOW_INSERTS = 7
PARK_SLEEP = 8
PARK_HOST_OP = 9   # anything the device lowers to "run this task on host"
PARK_THREADS = 10  # every live parallel-block thread is awaiting host IO

# Thread-lane states (parallel_wait/parallel_race device threads; the lane
# currently executing is tracked by VMInstance.cur_tid)
T_FREE = 0    # lane unused
T_NEW = 1     # spawned, never run (asyncio: scheduled, first slice pending)
T_READY = 2   # resumed — host IO completed, lane can continue
T_WAIT = 3    # parked on host IO (tpark_kind/tpark_arg say why/where)
T_DONE = 4    # subtask body completed

# par_mode values
PM_NONE = 0
PM_WAIT = 1   # parallel_wait (asyncio.gather)
PM_RACE = 2   # parallel_race (asyncio.wait FIRST_COMPLETED)
PM_DRAIN = 3  # race finished; never-run lanes get their first slice, then
              # everything pending is cancelled (asyncio scheduling parity)
