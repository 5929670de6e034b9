"""Device-native parallel_wait/parallel_race: thread lanes on the device,
blocking IO parking per lane, differential-equal to the host engine
(reference semantics: interpolation_engine.py:1581-1626)."""

import asyncio

import numpy as np
import pytest

from interpolation_engine_tpu import json5
from interpolation_engine_tpu.compiler import compile_program
from interpolation_engine_tpu.core.runtime import async_main
from interpolation_engine_tpu.io.manager import IOManager, ScriptedBackend
from interpolation_engine_tpu.programs.loader import add_line_numbers
from interpolation_engine_tpu.vm.config import DONE, PARKED, PARK_THREADS
from interpolation_engine_tpu.vm.driver import DeviceRunner, _stack
from interpolation_engine_tpu.vm import isa

from test_device_vm import CFG, compile_src


def run_host(src: str, tmp_path, responses, name="p.json5"):
    path = tmp_path / name
    path.write_text(src)
    io = IOManager(ScriptedBackend(list(responses)))
    state = asyncio.run(async_main(str(path), [], io))
    return state["output"], dict(state["inserts"])


def run_device(src: str, responses, mode="auto"):
    compiled = compile_src(src)
    assert not compiled.host_only, compiled.host_only_reason
    runner = DeviceRunner(
        compiled, CFG,
        io_factory=lambda i: IOManager(ScriptedBackend(list(responses))))
    batch = runner.make_instances(1)
    final = runner.run(batch, inner_steps=16, max_rounds=400)
    r = runner.results(final)[0]
    return r, runner


WAIT_SRC = """
{
    default_state: {order_index: 1, inserts: {}},
    order: [
        {cmd:'print', text:'a;'},
        {cmd:'parallel_wait', tasks: [
            {cmd:'serial', tasks:[
                {cmd:'print', text:'t0;'},
                {cmd:'user_input', prompt:'A? ', output_name:'x'},
                {cmd:'print', text:'x={x};'},
            ]},
            {cmd:'serial', tasks:[
                {cmd:'print', text:'t1;'},
                {cmd:'user_input', prompt:'B? ', output_name:'y'},
                {cmd:'print', text:'y={y};'},
            ]},
        ]},
        {cmd:'print', text:'z'},
    ],
    named_tasks: {}, save_states: {},
}
"""


def test_parallel_wait_native_lowering():
    compiled = compile_src(WAIT_SRC)
    ops = [row[0] for row in compiled.code]
    assert isa.OP_PAR_BEGIN in ops and isa.OP_THREAD_END in ops
    assert compiled.needs_threads == 2


def test_parallel_wait_differential(tmp_path, capsys):
    host_out, host_ins = run_host(WAIT_SRC, tmp_path, ["one", "two"])
    r, _ = run_device(WAIT_SRC, ["one", "two"])
    capsys.readouterr()
    assert r.status == DONE
    assert r.output == host_out
    assert r.inserts == host_ins


RACE_SRC = """
{
    default_state: {order_index: 1, inserts: {}},
    order: [
        {cmd:'parallel_race', tasks: [
            {cmd:'serial', tasks:[
                {cmd:'user_input', prompt:'> ', output_name:'ans'},
                {cmd:'print', text:'got {ans};'},
            ]},
            {cmd:'serial', tasks:[
                // blocks forever: only the race interrupts it (the
                // text_adventure pattern, examples/text_adventure.json5:192)
                {cmd:'user_choice', description:'waiting...', list:[],
                 output_name:'_'},
            ]},
        ]},
        {cmd:'print', text:'after'},
    ],
    named_tasks: {}, save_states: {},
}
"""


def test_parallel_race_cancels_blocked_lane(tmp_path, capsys):
    host_out, host_ins = run_host(RACE_SRC, tmp_path, ["go"])
    r, runner = run_device(RACE_SRC, ["go"])
    capsys.readouterr()
    assert r.status == DONE
    assert r.output == host_out == "got go;after"
    assert r.inserts == host_ins
    assert not runner._lanering.pending  # user_choice coroutine cancelled


AWAIT_SRC = """
{
    default_state: {order_index: 1, inserts: {}},
    order: [
        {cmd:'parallel_wait', tasks: [
            {cmd:'serial', tasks:[
                {cmd:'await_insert', name:'x'},
                {cmd:'print', text:'saw {x};'},
            ]},
            {cmd:'serial', tasks:[
                {cmd:'user_input', prompt:'? ', output_name:'x'},
            ]},
        ]},
        {cmd:'print', text:'end'},
    ],
    named_tasks: {}, save_states: {},
}
"""


def test_parallel_await_insert_cross_lane(tmp_path, capsys):
    host_out, host_ins = run_host(AWAIT_SRC, tmp_path, ["ping"])
    r, _ = run_device(AWAIT_SRC, ["ping"])
    capsys.readouterr()
    assert r.status == DONE
    assert r.output == host_out == "saw ping;end"
    assert r.inserts == host_ins


RACE_LOOP_SRC = """
{
    default_state: {order_index: 1, inserts: {}},
    order: [
        {cmd:'for', name_list_map: {round: ['r1', 'r2']}, tasks: [
            {cmd:'print', text:'[{round} '},
            {cmd:'parallel_race', tasks: [
                {cmd:'serial', tasks:[
                    // raced mid-loop: the second block entry must restart
                    // this for from 'a' (reference purges raced sub-cursors)
                    {cmd:'for', name_list_map: {item: ['a', 'b', 'c']}, tasks: [
                        {cmd:'user_input', prompt:'{item}? ', output_name:'v'},
                        {cmd:'print', text:'{item}={v};'},
                    ]},
                ]},
                {cmd:'serial', tasks:[
                    {cmd:'user_input', prompt:'stop? ', output_name:'s'},
                    {cmd:'print', text:'stopped {s};'},
                ]},
            ]},
            {cmd:'print', text:']'},
        ]},
    ],
    named_tasks: {}, save_states: {},
}
"""


class PromptKeyedBackend(ScriptedBackend):
    """Answers by prompt; prompts with no scripted answers block forever —
    so a lane can be suspended mid-loop and raced out."""

    def __init__(self, by_prompt: dict):
        super().__init__([])
        self.by_prompt = {k: list(v) for k, v in by_prompt.items()}

    async def user_input(self, prompt: str, default: str = "") -> str:
        queue = self.by_prompt.get(prompt)
        if not queue:
            await asyncio.Event().wait()
        return queue.pop(0)


def _race_loop_backend():
    # lane A answers 'a? ' then blocks at 'b? ' (mid-loop, counter=2);
    # lane B's 'stop? ' completes -> race cancels A mid-loop. The second
    # block entry must restart the inner for at 'a' (raced-cursor purge).
    return PromptKeyedBackend({
        "a? ": ["A1", "A2"],
        "stop? ": ["S1", "S2"],
    })


def test_parallel_race_restarts_inner_loop(tmp_path, capsys):
    path = tmp_path / "race_loop.json5"
    path.write_text(RACE_LOOP_SRC)
    host_io = IOManager(_race_loop_backend())
    host_state = asyncio.run(async_main(str(path), [], host_io))
    host_out, host_ins = host_state["output"], dict(host_state["inserts"])

    compiled = compile_src(RACE_LOOP_SRC)
    runner = DeviceRunner(
        compiled, CFG,
        io_factory=lambda i: IOManager(_race_loop_backend()))
    batch = runner.make_instances(1)
    final = runner.run(batch, inner_steps=16, max_rounds=400)
    r = runner.results(final)[0]
    capsys.readouterr()
    assert r.status == DONE
    assert r.output == host_out
    # both rounds started the inner for at 'a' (counter was reset) and
    # neither round reached 'b'
    assert "a=A1;" in r.output and "a=A2;" in r.output
    assert "b=" not in r.output
    assert r.inserts == host_ins


NESTED_SRC = """
{
    default_state: {order_index: 1, inserts: {}},
    order: [
        {cmd:'parallel_wait', tasks: [
            {cmd:'serial', tasks:[
                // nested parallel: parks wholesale to the host ring
                {cmd:'parallel_wait', tasks: [
                    {cmd:'serial', tasks:[
                        {cmd:'user_input', prompt:'i1 ', output_name:'a'}]},
                    {cmd:'serial', tasks:[
                        {cmd:'user_input', prompt:'i2 ', output_name:'b'}]},
                ]},
                {cmd:'print', text:'inner {a}{b};'},
            ]},
            {cmd:'serial', tasks:[
                {cmd:'print', text:'side;'},
            ]},
        ]},
        {cmd:'print', text:'end'},
    ],
    named_tasks: {}, save_states: {},
}
"""


def test_nested_parallel_parks_to_ring(tmp_path, capsys):
    compiled = compile_src(NESTED_SRC)
    # exactly one PAR_BEGIN: the outer block; the inner one is an OP_PARK
    assert sum(1 for row in compiled.code
               if row[0] == isa.OP_PAR_BEGIN) == 1
    host_out, host_ins = run_host(NESTED_SRC, tmp_path, ["p", "q"])
    r, _ = run_device(NESTED_SRC, ["p", "q"])
    capsys.readouterr()
    assert r.status == DONE
    assert r.output == host_out
    assert r.inserts == host_ins


def test_mid_parallel_export_resumes_per_lane(capsys):
    """Exporting an instance parked inside a parallel block yields
    PER-LANE cursor chains (PARITY divergence 6, closed in round 3): each
    waiting serial lane records its own order_index/<par>/<serial> cursor
    exactly like the reference's state dict mid-block
    (interpolation_engine.py:1637-1652), and resume re-enters each lane at
    its cursor instead of restarting the block."""
    import jax
    import jax.numpy as jnp
    from interpolation_engine_tpu.vm.driver import _index

    class BlockingBackend(ScriptedBackend):
        """user_input that never resolves — the save-point snapshot."""

        async def user_input(self, prompt, default=""):
            await asyncio.Event().wait()

    compiled = compile_src(WAIT_SRC)
    runner = DeviceRunner(
        compiled, CFG,
        io_factory=lambda i: IOManager(BlockingBackend([])))

    async def snapshot():
        # lane0 runs + parks; one ring round switches to lane1 (asyncio
        # gives every gathered task its first slice before any save
        # point); lane1 runs + parks → both lanes waiting
        b = runner.make_instances(1)
        for _ in range(4):
            b = runner._jitted(b, 8)
        sub = jax.tree.map(lambda a: np.asarray(a), b)
        st = await runner._service_instance(_index(sub, 0), 0, {})
        b = jax.tree.map(lambda x, s: x.at[0].set(jnp.asarray(s)), b, st)
        for _ in range(4):
            b = runner._jitted(b, 8)
        state = runner.export_state(b, 0)
        await runner._cancel_pending(0)
        return b, state

    batch, state = asyncio.run(snapshot())
    assert int(batch.status[0]) == PARKED
    assert int(batch.park_kind[0]) == PARK_THREADS
    capsys.readouterr()
    assert state["order_index"] == 2  # the parallel_wait task itself
    lane_keys = sorted(k for k in state if k.startswith("order_index/"))
    # EXACTLY the host's keys mid-block (incl. the reference's doubled
    # parallel label — traceback labels are chains and runtime labels
    # re-prepend the parent, a preserved quirk)
    par = "parallel_wait-6/parallel_wait-6"
    assert lane_keys == [f"order_index/{par}/serial-12",
                         f"order_index/{par}/serial-7"], state
    assert all(state[k] == 2 for k in lane_keys)  # each at its user_input
    assert state["output"] == "a;t0;t1;"

    # resume: lanes pick up AT their user_inputs — the lane prefixes
    # (t0;/t1;) must NOT re-print (restart-the-block would re-run them)
    resumed = DeviceRunner(
        compiled, CFG,
        io_factory=lambda i: IOManager(ScriptedBackend(["one", "two"])))
    inst = resumed.load_state(state)
    final = resumed.run(_stack([inst]), inner_steps=16, max_rounds=400)
    r = resumed.results(final)[0]
    capsys.readouterr()
    assert r.status == DONE
    assert r.output == "a;t0;t1;x=one;y=two;z"


def test_parallel_batch_lockstep(capsys):
    """A small batch of identical instances through the same parallel
    program — each with its own scripted IO — all complete identically."""
    compiled = compile_src(WAIT_SRC)
    runner = DeviceRunner(
        compiled, CFG,
        io_factory=lambda i: IOManager(ScriptedBackend([f"u{i}", f"v{i}"])))
    batch = runner.make_instances(4)
    final = runner.run(batch, inner_steps=16, max_rounds=400)
    rs = runner.results(final)
    capsys.readouterr()
    for i, r in enumerate(rs):
        assert r.status == DONE
        assert f"x=u{i};" in r.output and f"y=v{i};" in r.output
        assert r.output.endswith("z")


def test_ring_capacity_telemetry(capsys):
    """VERDICT W8: the driver measures how often instances blow VMConfig
    capacities and thrash the ring. A string larger than max_str parks
    with ERR_CAPACITY, is rescued on host byte-exactly, and shows up in
    ring_stats / the VM_STATS event."""
    from interpolation_engine_tpu.core.events import EVENTS

    big = "x" * 300  # > CFG.max_str working buffer
    src = """
    {
        default_state: {order_index: 1, inserts: {}},
        order: [
            {cmd:'set', item:'%s', output_name:'v'},
            {cmd:'print', text:'[{v}]'},
        ],
        named_tasks: {}, save_states: {},
    }
    """ % big
    compiled = compile_src(src)
    runner = DeviceRunner(compiled, CFG)
    before = EVENTS.counters.get("vm_stats", 0)
    final = runner.run(runner.make_instances(1), inner_steps=8,
                       max_rounds=60)
    r = runner.results(final)[0]
    capsys.readouterr()
    assert r.status == DONE
    assert r.output == f"[{big}]"
    assert runner.ring_stats["capacity_parks"] >= 1
    assert runner.ring_stats["parks"] >= runner.ring_stats["capacity_parks"]
    assert runner.ring_stats["rounds"] >= 1
    assert EVENTS.counters.get("vm_stats", 0) == before + 1


def test_ring_stats_clean_program(capsys):
    """A program within capacity reports zero capacity parks — the
    telemetry distinguishes IO parks from capacity thrash."""
    r, runner = run_device(WAIT_SRC, ["one", "two"])
    capsys.readouterr()
    assert r.status == DONE
    assert runner.ring_stats["capacity_parks"] == 0
    assert runner.ring_stats["parks"] >= 2  # the two user_inputs


def test_race_ready_await_continues_never_yielded_lane(tmp_path, capsys):
    """asyncio-twin ordering for await_insert inside a race (reference:
    executor.py:250-251 / interpolation_engine.py:1572-1574): a READY
    await never yields, so (a) a racing lane that reaches one continues
    synchronously and can WIN, and (b) a loser lane given its first
    slice after a synchronous winner (its first step was already queued
    before the FIRST_COMPLETED waiter's wake callback) also runs through
    it. A NOT-ready await suspends at the poll sleep, where the race
    cancel always lands — key-present-now or not. The device checks
    readiness in-kernel (step.py h_park), so UNREACHED prints on turns
    2-3 (won exists) but not turn 1."""
    src = """
    {
        default_state: {order_index: 1, inserts: {turn: 0}},
        order: [
            {cmd:'label', name:'@loop'},
            {cmd:'math', input:'{turn} + 1', output_name:'turn'},
            {cmd:'parallel_race', tasks:[
                {cmd:'serial', tasks:[
                    {cmd:'set', item:'gen-{turn}', output_name:'gen'},
                    {cmd:'print', text:'[{gen}]'},
                ]},
                {cmd:'serial', tasks:[
                    {cmd:'await_insert', name:'won'},
                    {cmd:'print', text:'UNREACHED'},
                ]},
            ]},
            {cmd:'parallel_race', tasks:[
                {cmd:'serial', tasks:[
                    {cmd:'await_insert', name:'gen'},
                    {cmd:'print', text:'SYNC-UNREACHED'},
                ]},
                {cmd:'serial', tasks:[
                    {cmd:'set', item:'w-{turn}', output_name:'won'},
                ]},
            ]},
            {cmd:'goto_map', text:'{turn}', target_maps:[
                {'3': '@end'}, {'*': '@loop'}]},
            {cmd:'label', name:'@end'},
            {cmd:'print', text:'fin {gen} {won}'},
        ],
        named_tasks: {}, save_states: {},
    }
    """
    host_out, host_ins = run_host(src, tmp_path, [])
    assert host_out == ("[gen-1]SYNC-UNREACHED"
                        "[gen-2]UNREACHEDSYNC-UNREACHED"
                        "[gen-3]UNREACHEDSYNC-UNREACHED"
                        "fin gen-3 w-3")
    r, runner = run_device(src, [])
    capsys.readouterr()
    assert r.status == DONE
    assert r.output == host_out
    assert r.inserts == host_ins
