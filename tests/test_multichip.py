"""Multi-device correctness: a sharded batch (8 virtual CPU devices via
conftest's xla_force_host_platform_device_count) through the full driver
loop — device steps AND host-ring park/resume cycles — must be byte-exact
vs the unsharded run (SURVEY §2.4; parallel/mesh.py)."""

import jax
import numpy as np
import pytest

from interpolation_engine_tpu.io.manager import IOManager, ScriptedBackend
from interpolation_engine_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
)
from interpolation_engine_tpu.vm.config import DONE

from test_device_vm import CFG, compile_src

SRC = """
{
    default_state: {order_index: 1, inserts: {greet: 'hi'}},
    order: [
        {cmd:'print', text:'{greet};'},
        {cmd:'user_input', prompt:'? ', output_name:'name'},
        {cmd:'set', item:'{name}!', output_name:'salut'},
        {cmd:'print', text:'[{salut}]'},
        {cmd:'user_input', prompt:'again? ', output_name:'more'},
        {cmd:'print', text:'({more})'},
    ],
    named_tasks: {}, save_states: {},
}
"""

N = 1024


def _runner(mode="jit"):
    from interpolation_engine_tpu.vm.driver import DeviceRunner
    compiled = compile_src(SRC)
    return DeviceRunner(
        compiled, CFG, mode=mode,
        io_factory=lambda i: IOManager(
            ScriptedBackend([f"u{i}", f"v{i}"])))


@pytest.mark.slow
def test_sharded_ring_run_matches_unsharded(capsys):
    n_dev = len(jax.devices())
    assert n_dev >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8)

    runner = _runner()
    batch = shard_batch(runner.make_instances(N), mesh)
    final = runner.run(batch, inner_steps=8, max_rounds=60)

    ref_runner = _runner()
    ref_final = ref_runner.run(ref_runner.make_instances(N),
                               inner_steps=8, max_rounds=60)
    capsys.readouterr()

    status = np.asarray(final.status)
    assert (status == DONE).all()
    # byte-exact across every instance: output buffers and insert stores
    for f in ("status", "pc", "out", "out_len", "vtype", "vint"):
        a = np.asarray(getattr(final, f))
        b = np.asarray(getattr(ref_final, f))
        assert np.array_equal(a, b), f"field {f} diverged"
    rs = runner.results(final)
    ref_rs = ref_runner.results(ref_final)
    for i in (0, 1, 7, N // 2, N - 1):
        assert rs[i].output == ref_rs[i].output == f"hi;[u{i}!](v{i})"
        assert rs[i].inserts == ref_rs[i].inserts


@pytest.mark.slow
def test_sharded_parallel_block(capsys):
    """Thread-lane parallel blocks on a sharded batch: each instance races
    its lanes through the ring; outputs stay per-instance correct."""
    from test_parallel_device import WAIT_SRC
    from interpolation_engine_tpu.vm.driver import DeviceRunner
    mesh = make_mesh(8)
    compiled = compile_src(WAIT_SRC)
    runner = DeviceRunner(
        compiled, CFG, mode="jit",
        io_factory=lambda i: IOManager(
            ScriptedBackend([f"x{i}", f"y{i}"])))
    batch = shard_batch(runner.make_instances(64), mesh)
    final = runner.run(batch, inner_steps=8, max_rounds=200)
    rs = runner.results(final)
    capsys.readouterr()
    for i, r in enumerate(rs):
        assert r.status == DONE
        assert r.output == f"a;t0;x=x{i};t1;y=y{i};z"


def test_turbo_sharded_step_bit_identical():
    """The turbo mega-kernel over the 8-device mesh (shard_map, per-leaf
    specs — sbuf shards on its INSTANCE axis, not its leading rows axis)
    equals the unsharded kernel bit-for-bit (VERDICT r2 missing #3)."""
    from bench import adventure_program
    from interpolation_engine_tpu.parallel.mesh import shard_turbo_batch
    from interpolation_engine_tpu.vm.turbo import (
        TurboConfig,
        TurboEngine,
        build_sharded_step_fn,
    )

    compiled = compile_src(adventure_program(3, t_max=30))
    tcfg = TurboConfig(tile=2, width=64, out_width=128, k_steps=8)
    eng = TurboEngine(compiled, tcfg)
    n = 16
    ref = eng.make_batch(n)
    step = eng.step_fn(ref.regs.shape[0])
    for _ in range(3):
        ref = step(ref)

    mesh = make_mesh(8)
    sharded = shard_turbo_batch(eng.make_batch(n), mesh)
    sstep = build_sharded_step_fn(eng.plan, tcfg, ref.regs.shape[0],
                                  eng.interpret, mesh)
    for _ in range(3):
        sharded = sstep(sharded)

    for name, a, b in zip(("regs", "sbuf", "out"), jax.device_get(sharded),
                          jax.device_get(ref)):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name
    assert len({s.device for s in sharded.regs.addressable_shards}) == 8
