#!/usr/bin/env python
"""Benchmark: batched VM task throughput on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: a compute-heavy program spine exercising the hot device opcodes
(interpolation, math, goto_map branching, set) over N concurrent instances —
the BASELINE.json configuration ("batched tasks/sec/chip"). The reference
publishes no numbers (BASELINE.md), so vs_baseline is measured against the
driver's north-star target of 10M tasks/sec/chip.

Task accounting is honest: the value counts executed VM instructions
(sum of per-instance step counters), not wall-clock × batch.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TARGET_TASKS_PER_SEC = 10_000_000.0

BENCH_PROGRAM = """
{
    default_state: {order_index: 1, inserts: {i: 0, acc: 0, word: 'spin'}},
    order: [
        {cmd:'label', name:'@loop'},
        {cmd:'math', input:'{i} + 1', output_name:'i'},
        {cmd:'set', item:'state-{i}', output_name:'tag'},
        {cmd:'math', input:'{acc} + {i} % 7', output_name:'acc'},
        {cmd:'goto_map', text:'{word}-{i}', target_maps:[
            {'spin-512': '@end'},
            {'spin-*': '@loop'},
            {'*': '@loop'},
        ]},
        {cmd:'label', name:'@end'},
        {cmd:'print', text:'done acc={acc}'},
    ],
    named_tasks: {}, save_states: {},
}
"""


def main():
    """Try the accelerator in a killable child first; its compile can exceed
    any reasonable budget on remote-compile backends, in which case we fall
    back to a CPU-jit measurement (clearly labeled) rather than hanging."""
    if "--child" in sys.argv or os.environ.get("BENCH_NO_SUBPROCESS"):
        return measure()

    import subprocess
    budget = float(os.environ.get("BENCH_COMPILE_BUDGET_S", 1500))
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            capture_output=True, text=True, timeout=budget)
        if proc.returncode == 0 and proc.stdout.strip():
            sys.stdout.write(proc.stdout)
            sys.stderr.write(proc.stderr[-2000:])
            return
        sys.stderr.write(f"# device bench failed (rc={proc.returncode}); "
                         f"falling back to CPU\n{proc.stderr[-1500:]}\n")
    except subprocess.TimeoutExpired:
        sys.stderr.write(f"# device bench exceeded {budget:.0f}s compile "
                         f"budget; falling back to CPU jit\n")
    os.environ["BENCH_FORCE_CPU"] = "1"
    os.environ.setdefault("BENCH_INSTANCES", "2000")
    return measure()


def measure():
    import jax

    if os.environ.get("BENCH_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from interpolation_engine_tpu import json5
    from interpolation_engine_tpu.compiler import compile_program
    from interpolation_engine_tpu.programs.loader import add_line_numbers
    from interpolation_engine_tpu.programs.validator import validate_program

    platform = jax.devices()[0].platform
    on_accel = platform not in ("cpu",)

    n_instances = int(os.environ.get(
        "BENCH_INSTANCES", 131_072 if on_accel else 2_048))
    rounds = int(os.environ.get("BENCH_ROUNDS", 8))

    program = json5.loads(add_line_numbers(BENCH_PROGRAM))
    validate_program(program)
    compiled = compile_program(program)
    assert not compiled.host_only

    # persistent compile cache: TPU executables reload across processes
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_ie_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    engine = os.environ.get("BENCH_ENGINE", "turbo")
    if engine == "turbo":
        executed, elapsed, compile_s = _measure_turbo(
            compiled, n_instances, rounds, on_accel)
    else:
        executed, elapsed, compile_s = _measure_general(
            compiled, n_instances, rounds)

    tasks_per_sec = executed / elapsed
    result = {
        "metric": (f"batched VM tasks/sec ({n_instances} instances, "
                   f"{platform}, {engine} engine)"),
        "value": round(tasks_per_sec, 1),
        "unit": "tasks/sec",
        "vs_baseline": round(tasks_per_sec / TARGET_TASKS_PER_SEC, 4),
    }
    print(json.dumps(result))
    print(f"# executed={executed} elapsed={elapsed:.3f}s "
          f"compile={compile_s:.1f}s platform={platform}", file=sys.stderr)


def _measure_turbo(compiled, n_instances, rounds, on_accel):
    """The turbo engine: one Pallas mega-kernel, K VM steps per launch."""
    import numpy as np
    import jax
    from interpolation_engine_tpu.vm.turbo import TurboConfig, TurboEngine

    inner_steps = int(os.environ.get("BENCH_INNER_STEPS", 64))
    tcfg = TurboConfig(tile=int(os.environ.get("BENCH_TILE", 512)),
                       width=128, out_width=128, k_steps=inner_steps)
    eng = TurboEngine(compiled, tcfg)
    batch = eng.make_batch(n_instances)
    step = eng.step_fn(batch.regs.shape[0])

    t0 = time.perf_counter()
    batch = step(batch)
    jax.block_until_ready(batch.regs)
    compile_s = time.perf_counter() - t0

    steps0 = int(np.asarray(batch.regs[:, 2]).sum())
    t0 = time.perf_counter()
    for _ in range(rounds):
        batch = step(batch)
    jax.block_until_ready(batch.regs)
    elapsed = time.perf_counter() - t0
    steps1 = int(np.asarray(batch.regs[:, 2]).sum())
    return steps1 - steps0, elapsed, compile_s


def _measure_general(compiled, n_instances, rounds):
    """The general lax.switch VM (semantically total fallback engine)."""
    import numpy as np
    import jax
    from interpolation_engine_tpu.vm.config import VMConfig
    from interpolation_engine_tpu.vm.driver import DeviceRunner

    inner_steps = int(os.environ.get("BENCH_INNER_STEPS", 8))
    cfg = VMConfig(max_str=96, max_key=24, n_slots=8, arena_size=512,
                   pool_size=8, out_size=128, max_subst=6, max_stars=2,
                   max_list=4, max_fix=4)
    runner = DeviceRunner(compiled, cfg, mode="jit")
    batch = runner.make_instances(n_instances)

    t0 = time.perf_counter()
    warm = runner._jitted(batch, inner_steps)
    jax.block_until_ready(warm.steps)
    compile_s = time.perf_counter() - t0

    state = batch
    steps_before = int(np.asarray(jax.device_get(state.steps)).sum())
    t0 = time.perf_counter()
    for _ in range(rounds):
        state = runner._jitted(state, inner_steps)
    jax.block_until_ready(state.steps)
    elapsed = time.perf_counter() - t0
    steps_after = int(np.asarray(jax.device_get(state.steps)).sum())
    return steps_after - steps_before, elapsed, compile_s


if __name__ == "__main__":
    main()
