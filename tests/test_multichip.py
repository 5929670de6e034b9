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


@pytest.mark.slow
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


@pytest.mark.slow
def test_turbo_sharded_ring_run_matches_unsharded(capsys):
    """The turbo engine's FULL driver loop on a sharded batch (VERDICT r3
    next #5): park/resume cycles through both ring paths — the vectorized
    fast path (literal-prompt user_input) and the exact slow path
    (interpolated prompt) — plus an output spill, must be byte-identical
    to the unsharded run, with the batch actually spread over 8 devices."""
    from interpolation_engine_tpu.vm.turbo import TurboConfig, TurboEngine

    src = """
    {
        default_state: {order_index: 1, inserts: {i: 0, who: 'w'}},
        order: [
            {cmd:'label', name:'@loop'},
            {cmd:'math', input:'{i} + 1', output_name:'i'},
            {cmd:'print', text:'line {i} of text;'},
            {cmd:'goto_map', text:'{i}', target_maps:[
                {'4': '@ask'}, {'*': '@loop'}]},
            {cmd:'label', name:'@ask'},
            {cmd:'user_input', prompt:'fast? ', output_name:'a'},
            {cmd:'user_input', prompt:'slow {who}? ', output_name:'b'},
            {cmd:'parallel_race', tasks:[
                {cmd:'serial', tasks:[
                    {cmd:'set', item:'g-{i}', output_name:'gen'},
                ]},
                {cmd:'serial', tasks:[
                    {cmd:'user_input', prompt:'> ', output_name:'c'},
                ]},
            ]},
            {cmd:'print', text:'a={a} b={b} c={c} gen={gen}'},
        ],
        named_tasks: {}, save_states: {},
    }
    """
    # out_width small enough that the prints spill through the ring
    tcfg = TurboConfig(tile=4, width=64, out_width=48, k_steps=16)
    N = 64

    def mk(mesh=None):
        compiled = compile_src(src)
        return TurboEngine(
            compiled, tcfg, mesh=mesh,
            io_factory=lambda i: IOManager(
                ScriptedBackend([f"A{i}", f"B{i}", f"C{i}"])))

    ref_eng = mk()
    ref = ref_eng.run(ref_eng.make_batch(N), max_rounds=300)

    mesh = make_mesh(8)
    eng = mk(mesh)
    batch = eng.make_batch(N)
    assert len({s.device for s in batch.regs.addressable_shards}) == 8
    final = eng.run(batch, max_rounds=300)
    capsys.readouterr()

    assert eng.ring_stats["fast_parks"] > 0          # fast path exercised
    assert eng.ring_stats["parks"] > eng.ring_stats["fast_parks"]  # slow too
    assert not eng._escape_results

    for name, a, b in zip(("regs", "sbuf", "out"), jax.device_get(final),
                          jax.device_get(ref)):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name
    rs = eng.results(final, N)
    ref_rs = ref_eng.results(ref, N)
    for i in (0, 1, 7, N // 2, N - 1):
        assert rs[i].status == DONE
        assert rs[i].output == ref_rs[i].output
        assert rs[i].inserts == ref_rs[i].inserts
        assert f"a=A{i} b=B{i} c=C{i}" in rs[i].output
