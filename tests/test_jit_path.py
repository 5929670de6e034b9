"""Correctness of the general engine's JIT path (the code that runs on
TPUs): `run_batch`'s uniform-dispatch fast path and the per-lane mixed
path must produce byte-identical results to the host oracle.

All programs here share ONE opcode set (the skeleton embeds every command
used, and variants diverge only through data/ARGs), so the ~30s XLA-CPU
compile of the batched step happens once and is reused — and persists
across runs via the compilation cache.
"""

import asyncio

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interpolation_engine_tpu import json5
from interpolation_engine_tpu.compiler import compile_program
from interpolation_engine_tpu.core.runtime import async_main
from interpolation_engine_tpu.io.manager import IOManager, ScriptedBackend
from interpolation_engine_tpu.programs.loader import add_line_numbers
from interpolation_engine_tpu.programs.validator import validate_program
from interpolation_engine_tpu.vm.config import DONE, VMConfig
from interpolation_engine_tpu.vm.driver import DeviceRunner

CFG = VMConfig(max_str=128, max_key=32, n_slots=16, arena_size=2048,
               pool_size=16, out_size=512, max_subst=8, max_stars=3,
               max_list=8, max_fix=8)

# One skeleton, every variant: ARG1 picks the route (lockstep batches pass
# equal ARG1s and exercise the uniform fast path; mixed batches pass
# different ARG1s and force per-lane dispatch); the 'ask' route contains a
# user_input park so OP_PARK is always part of the compiled opcode set.
SKELETON = """
{
    default_state: {order_index: 1, inserts: {i: 0, acc: 0, w: 'go'}},
    order: [
        {cmd:'goto_map', text:'{ARG1}', target_maps:[
            {'ask': '@ask'}, {'*': '@spin'},
        ]},
        {cmd:'label', name:'@ask'},
        {cmd:'user_input', prompt:'name?', output_name:'who'},
        {cmd:'print', text:'hi {who}! '},
        {cmd:'goto', name:'@spin'},
        {cmd:'label', name:'@spin'},
        {cmd:'math', input:'{i} + 1', output_name:'i'},
        {cmd:'set', item:'s-{i}-{w}', output_name:'tag'},
        {cmd:'math', input:'{acc} + {i} % 5', output_name:'acc'},
        {cmd:'goto_map', text:'{w}-{i}', target_maps:[
            {'go-6': '@end'}, {'go-*': '@spin'}, {'*': '@spin'},
        ]},
        {cmd:'label', name:'@end'},
        {cmd:'print', text:'acc={acc} tag={tag}'},
    ],
    named_tasks: {}, save_states: {},
}
"""


def _compiled():
    program = json5.loads(add_line_numbers(SKELETON))
    validate_program(program)
    return compile_program(program)


def _host(tmp_path, args, responses=()):
    path = tmp_path / "p.json5"
    path.write_text(SKELETON)
    io = IOManager(ScriptedBackend(list(responses)))
    return asyncio.run(async_main(str(path), list(args), io))


def _concat(batches):
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *batches)


@pytest.mark.slow
def test_jit_lockstep_uniform_path(tmp_path, capsys):
    """All lanes share every pc → run_batch takes the scalar-opcode fast
    path each step. Outputs must be byte-identical to the host."""
    host = _host(tmp_path, ["spin"])
    capsys.readouterr()
    runner = DeviceRunner(_compiled(), CFG, mode="jit")
    batch = runner.make_instances(5, ["spin"])
    final = runner.run(batch, inner_steps=16, max_rounds=100)
    for r in runner.results(final):
        assert r.status == DONE
        assert r.output == host["output"]
        assert r.inserts == dict(host["inserts"])


@pytest.mark.slow
def test_jit_divergent_mixed_path(tmp_path, capsys):
    """Lanes at different pcs force the vmapped per-lane switch. The park
    route (user_input) must also resume correctly under jit."""
    host_spin = _host(tmp_path, ["spin"])
    host_ask = _host(tmp_path, ["ask"], responses=["ada"])
    capsys.readouterr()

    runner = DeviceRunner(
        _compiled(), CFG, mode="jit",
        io_factory=lambda i: IOManager(ScriptedBackend(["ada"])))
    spin = runner.make_instances(2, ["spin"])
    ask = runner.make_instances(2, ["ask"])
    batch = _concat([spin, ask])
    final = runner.run(batch, inner_steps=16, max_rounds=100)
    results = runner.results(final)
    want = [host_spin, host_spin, host_ask, host_ask]
    for r, h in zip(results, want):
        assert r.status == DONE
        assert r.output == h["output"]
        assert r.inserts == dict(h["inserts"])


@pytest.mark.slow
def test_jit_uniform_and_mixed_agree():
    """The same lanes run lockstep vs interleaved-divergent must end in
    identical states: the two dispatch paths are interchangeable."""
    runner = DeviceRunner(_compiled(), CFG, mode="jit")
    lock = runner.make_instances(4, ["spin"])
    final_lock = runner.run(lock, inner_steps=16, max_rounds=100)

    # skew starting pcs so the batch is never uniform: two lanes pre-step
    runner2 = DeviceRunner(_compiled(), CFG, mode="jit")
    skew = runner2.make_instances(4, ["spin"])
    half = jax.tree.map(lambda x: x[:2], skew)
    half = runner2._jitted(half, 3)  # 3 steps ahead
    skewed = _concat([half, jax.tree.map(lambda x: x[2:], skew)])
    final_skew = runner2.run(skewed, inner_steps=16, max_rounds=100)

    out_lock = runner.results(final_lock)
    out_skew = runner2.results(final_skew)
    for a, b in zip(out_lock, out_skew):
        assert a.status == b.status == DONE
        assert a.output == b.output
        assert a.inserts == b.inserts


# The device text_adventure run under jit lives in
# test_device_text_adventure.py (parametrized over eager/jit).
