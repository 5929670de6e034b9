"""Device VM end-to-end: compiled programs vs. the host oracle."""

import asyncio

import numpy as np
import pytest

from interpolation_engine_tpu import json5
from interpolation_engine_tpu.compiler import compile_program
from interpolation_engine_tpu.core.runtime import async_main
from interpolation_engine_tpu.io.manager import IOManager, ScriptedBackend
from interpolation_engine_tpu.programs.loader import add_line_numbers, load
from interpolation_engine_tpu.programs.validator import validate_program
from interpolation_engine_tpu.vm.config import VMConfig, DONE
from interpolation_engine_tpu.vm.driver import DeviceRunner

EXAMPLES = "/root/reference/examples"

CFG = VMConfig(max_str=256, n_slots=24, arena_size=4096, pool_size=64,
               out_size=1024, max_list=16)


def compile_src(src: str):
    program = json5.loads(add_line_numbers(src))
    if "named_tasks" not in program:
        program["named_tasks"] = {}
    program.setdefault("save_states", {})
    validate_program(program)
    return compile_program(program)


def run_device(src_or_compiled, n=1, args=(), io_factory=None, cfg=CFG):
    compiled = (src_or_compiled if not isinstance(src_or_compiled, str)
                else compile_src(src_or_compiled))
    assert not compiled.host_only, compiled.host_only_reason
    runner = DeviceRunner(compiled, cfg, io_factory=io_factory)
    batch = runner.make_instances(n, list(args))
    final = runner.run(batch, inner_steps=32)
    return runner.results(final), runner


def run_host(src: str, tmp_path, args=(), responses=()):
    path = tmp_path / "prog.json5"
    path.write_text(src)
    backend = ScriptedBackend(list(responses))
    io = IOManager(backend)
    state = asyncio.run(async_main(str(path), list(args), io))
    return state


SRC_HELLO = """
{
    default_state: {order_index: 1, inserts: {}},
    order: [ {cmd:'print', text:'Hello, world!'} ],
    named_tasks: {}, save_states: {},
}
"""

SRC_MATH = """
{
    default_state: {order_index: 1, inserts: {}},
    order: [
        {cmd:'math', input:'max(1,2,3)', output_name:'result'},
        {cmd:'print', text:'The result is {result}!\\n'},
    ],
    named_tasks: {}, save_states: {},
}
"""

SRC_CONTROL = """
{
    default_state: {order_index: 1, inserts: {n: 0}},
    order: [
        {cmd:'label', name:'@top'},
        {cmd:'math', input:'{n} + 1', output_name:'n'},
        {cmd:'goto_map', text:'{n}', target_maps:[
            {'5': '@done'},
            {'*': '@top'},
        ]},
        {cmd:'label', name:'@done'},
        {cmd:'print', text:'n={n}'},
    ],
    named_tasks: {}, save_states: {},
}
"""

SRC_LISTS = """
{
    default_state: {order_index: 1, inserts: {l: ['a','b','c','d']}},
    order: [
        {cmd:'list_join', list:'{l}', before:'<', between:'|', after:'>', output_name:'joined'},
        {cmd:'list_index', list:'{l}', index:-1, output_name:'last'},
        {cmd:'list_slice', list:'{l}', from_index:2, to_index:3, output_name:'mid'},
        {cmd:'list_append', list:'{l}', item:'e', output_name:'l2'},
        {cmd:'list_remove', list:'{l2}', item:'a', output_name:'l3'},
        {cmd:'list_remove', list:'{l3}', item:'zz', output_name:'l4'},
        {cmd:'list_concat', lists:['{l4}','{mid}'], output_name:'l5'},
        {cmd:'math', input:'length(l5)', output_name:'cnt'},
        {cmd:'list_join', list:'{mid}', before:'', between:'+', after:'', output_name:'midj'},
        {cmd:'print', text:'{joined} {last} {midj} {cnt}'},
    ],
    named_tasks: {}, save_states: {},
}
"""

SRC_FOR = """
{
    default_state: {order_index: 1, inserts: {total: 0}},
    order: [
        {cmd:'for', name_list_map:{x: ['1','2','3'], y: ['10','20','30']},
         tasks:[
            {cmd:'math', input:'{total} + {x} * {y}', output_name:'total'},
        ]},
        {cmd:'print', text:'total={total}'},
    ],
    named_tasks: {}, save_states: {},
}
"""

SRC_SERIAL_GOTO = """
{
    default_state: {order_index: 1, inserts: {}},
    order: [
        {cmd:'serial', tasks:[
            {cmd:'print', text:'a'},
            {cmd:'goto', name:'@skip'},
            {cmd:'print', text:'X'},
            {cmd:'label', name:'@skip'},
            {cmd:'print', text:'b'},
        ]},
        {cmd:'print', text:'c'},
    ],
    named_tasks: {}, save_states: {},
}
"""

SRC_REPLACE = """
{
    default_state: {order_index: 1, inserts: {msg: 'say [hi] now  ok'}},
    order: [
        {cmd:'replace_map', item:'{msg}', output_name:'o1', wildcard_maps:[
            {'*[*]*': '{1}<{2}>{3}'},
            {'*': '{1}'},
        ]},
        {cmd:'replace_map', repeat_until_done:true, item:'{o1}', output_name:'o2',
         wildcard_maps:[
            {'*  *': '{1} {2}'},
            {'*': '{1}'},
        ]},
        {cmd:'replace_map', item:'{never_set_but_later}', output_name:'o3',
         wildcard_maps:[
            {'NULL': '(none)'},
            {'*': '{1}'},
        ]},
        {cmd:'print', text:'{o2}|{o3}'},
        {cmd:'set', item:'x', output_name:'never_set_but_later'},
    ],
    named_tasks: {}, save_states: {},
}
"""

SRC_DELETE = """
{
    default_state: {order_index: 1, inserts: {
        'a/1': 'x', 'a/2': 'y', keep: 'z', b: 'w'}},
    order: [
        {cmd:'delete', wildcards:['a/*']},
        {cmd:'set', item:'u', output_name:'extra'},
        {cmd:'delete_except', wildcards:['keep', 'b']},
        {cmd:'print', text:'{keep}{b}'},
    ],
    named_tasks: {}, save_states: {},
}
"""

SRC_UNESCAPE = r"""
{
    default_state: {order_index: 1, inserts: {name: 'ada'}},
    order: [
        {cmd:'set', item:'\\{name\\}', output_name:'tpl'},
        {cmd:'unescape', item:'{tpl}', output_name:'resolved'},
        {cmd:'print', text:'{resolved}'},
    ],
    named_tasks: {}, save_states: {},
}
"""

SRC_NAMED = """
{
    default_state: {order_index: 1, inserts: {}},
    order: [
        {cmd:'run_task', task_name:'hello'},
        {cmd:'run_task', task_name:'hello'},
    ],
    named_tasks: { hello: {cmd:'print', text:'hi '} },
    save_states: {},
}
"""


@pytest.mark.parametrize("src,expected_out", [
    (SRC_HELLO, "Hello, world!"),
    (SRC_MATH, "The result is 3!\n"),
    (SRC_CONTROL, "n=5"),
    (SRC_LISTS, "<a|b|c|d> d b+c 6"),
    (SRC_FOR, "total=140"),
    (SRC_SERIAL_GOTO, "abc"),
    (SRC_REPLACE, "say <hi> now ok|(none)"),
    (SRC_DELETE, "zw"),
    (SRC_UNESCAPE, "ada"),
    (SRC_NAMED, "hi hi "),
])
def test_device_matches_host(src, expected_out, tmp_path, capsys):
    host_state = run_host(src, tmp_path)
    assert host_state["output"] == expected_out
    results, runner = run_device(src)
    r = results[0]
    assert r.status == DONE, r
    assert r.output == host_state["output"]
    # inserts must agree too (modulo ordering)
    host_inserts = {k: v for k, v in host_state["inserts"].items()}
    assert r.inserts == host_inserts
    capsys.readouterr()


def test_device_batch_divergent_instances(capsys):
    """Instances taking different branches via ARG1."""
    src = """
    {
        default_state: {order_index: 1, inserts: {}},
        order: [
            {cmd:'goto_map', text:'{ARG1}', target_maps:[
                {'alpha': '@a'}, {'*': '@b'},
            ]},
            {cmd:'label', name:'@a'},
            {cmd:'print', text:'path A'},
            {cmd:'goto', name:'@end'},
            {cmd:'label', name:'@b'},
            {cmd:'print', text:'path B ({ARG1})'},
            {cmd:'label', name:'@end'},
        ],
        named_tasks: {}, save_states: {},
    }
    """
    compiled = compile_src(src)
    runner = DeviceRunner(compiled, CFG)
    import jax
    batches = [runner.make_instances(1, [arg])
               for arg in ["alpha", "beta", "gamma"]]
    batch = jax.tree.map(lambda *xs: __import__("jax.numpy", fromlist=["j"])
                         .concatenate(xs), *batches)
    final = runner.run(batch, inner_steps=16)
    results = runner.results(final)
    assert results[0].output == "path A"
    assert results[1].output == "path B (beta)"
    assert results[2].output == "path B (gamma)"


def test_device_user_input_parks_to_host(tmp_path, capsys):
    src = """
    {
        default_state: {order_index: 1, inserts: {}},
        order: [
            {cmd:'user_input', prompt:'name? ', output_name:'name'},
            {cmd:'user_choice', description:'pick', list:['x','y'], output_name:'c'},
            {cmd:'print', text:'{name}/{c}'},
        ],
        named_tasks: {}, save_states: {},
    }
    """
    ios = {}

    def io_factory(i):
        if i not in ios:
            ios[i] = IOManager(ScriptedBackend([f"user{i}", "2"]))
        return ios[i]

    results, _ = run_device(src, n=3, io_factory=io_factory)
    for i, r in enumerate(results):
        assert r.status == DONE
        assert r.output == f"user{i}/y"
    capsys.readouterr()


def test_device_matches_reference_examples(capsys):
    # hello_world.json5 and math.json5 compile and run natively
    for name, want in [("hello_world", "Hello, world!"),
                       ("math", "The result is 3!\n")]:
        program, _ = load(f"{EXAMPLES}/{name}.json5")
        compiled = compile_program(program)
        assert not compiled.host_only
        runner = DeviceRunner(compiled, CFG)
        batch = runner.make_instances(4)
        final = runner.run(batch)
        for r in runner.results(final):
            assert r.status == DONE
            assert r.output == want
    capsys.readouterr()


def test_text_adventure_compiles_with_native_parallel():
    from interpolation_engine_tpu.vm import isa
    program, _ = load(f"{EXAMPLES}/text_adventure.json5")
    compiled = compile_program(program)
    assert not compiled.host_only
    # the parallel_race block lowered to device thread lanes (2 subtasks),
    # not a whole-block host park
    ops = [int(compiled.code[pc][0]) for pc in range(compiled.n_instr)]
    assert isa.OP_PAR_BEGIN in ops and isa.OP_THREAD_END in ops
    assert compiled.needs_threads == 2
    park_tasks = [compiled.source_tasks[pc]
                  for pc in range(compiled.n_instr)
                  if ops[pc] == isa.OP_PARK]
    assert not any(t and t.get("cmd") == "parallel_race"
                   for t in park_tasks)


def test_dynamic_task_list_is_host_only():
    from interpolation_engine_tpu import json5
    from interpolation_engine_tpu.programs.loader import add_line_numbers
    from interpolation_engine_tpu.programs.validator import validate_program
    src = """
    {
        default_state: {order_index: 1,
                        inserts: {body: [{cmd:'print', text:'x', line:1}]}},
        order: [ {cmd:'serial', tasks:'{body}'} ],
        named_tasks: {}, save_states: {},
    }
    """
    program = json5.loads(add_line_numbers(src))
    validate_program(program)
    compiled = compile_program(program)
    assert compiled.host_only
    assert "dynamic task list" in compiled.host_only_reason


def test_batched_ring_services_many_parks_at_once(capsys):
    """32 instances all parking on user_input must be gathered, serviced,
    and scattered back in ONE ring round (with ring_ms telemetry) — not
    via per-instance device indexing."""
    import io as io_mod
    import json as json_mod

    from interpolation_engine_tpu.core.events import EVENTS
    from interpolation_engine_tpu.io.manager import IOManager, ScriptedBackend

    src = """
    {
        default_state: {order_index: 1, inserts: {}},
        order: [
            {cmd:'user_input', prompt:'p', output_name:'v'},
            {cmd:'print', text:'got {v};'},
        ],
        named_tasks: {}, save_states: {},
    }
    """
    program = json5.loads(add_line_numbers(src))
    validate_program(program)
    compiled = compile_program(program)
    runner = DeviceRunner(
        compiled, CFG,
        io_factory=lambda i: IOManager(ScriptedBackend([f"a{i}"])))
    batch = runner.make_instances(32)
    sink = io_mod.StringIO()
    old_sink = EVENTS.json_sink
    EVENTS.json_sink = sink
    try:
        final = runner.run(batch, inner_steps=8, max_rounds=50)
    finally:
        EVENTS.json_sink = old_sink
    capsys.readouterr()
    results = runner.results(final)
    for i, r in enumerate(results):
        assert r.status == DONE
        assert r.output == f"got a{i};"
    rounds = [json_mod.loads(line) for line in sink.getvalue().splitlines()
              if json_mod.loads(line)["kind"] == "vm_round"]
    ring_rounds = [r for r in rounds if r.get("parked", 0) > 0]
    assert ring_rounds, rounds
    # all 32 parks drained in one batched round, with ring timing recorded
    assert ring_rounds[0]["parked"] == 32
    assert ring_rounds[0]["resumed"] == 32
    assert ring_rounds[0]["ring_ms"] >= 0


def test_for_head_park_runs_whole_loop_on_host(capsys):
    """>MAX_PAIRS name_list_map parks at the for HEAD; the host executes
    the WHOLE loop, and the device resumes at the loop exit (not the body)
    with the counter reset — regression for a runaway re-entry bug."""
    src = """
    { default_state: {order_index: 1, inserts: {}},
      order: [
        {cmd:'for', name_list_map: {a:['1','2'], b:['x','y'], c:['p','q'],
                                    d:['m','n'], e:['u','v']}, tasks: [
          {cmd:'print', text:'[{a}{b}{c}{d}{e}]'},
        ]},
        {cmd:'print', text:'end'},
      ], named_tasks: {}, save_states: {} }
    """
    runner = DeviceRunner(compile_src(src), CFG)
    final = runner.run(runner.make_instances(1), inner_steps=8,
                       max_rounds=60)
    r = runner.results(final)[0]
    capsys.readouterr()
    assert r.status == DONE
    assert r.output == "[1xpmu][2yqnv]end"
    import numpy as np
    assert (np.asarray(final.counters) == 0).all()


def test_for_head_park_mid_loop_resumes_at_counter(capsys):
    """A head park at iteration 2 (oversized element) hands the host the
    counter cursor: earlier iterations are NOT re-executed."""
    big = "B" * 300  # > CFG.max_str → iteration-2 var set parks at the head
    src = """
    { default_state: {order_index: 1, inserts: {}},
      order: [
        {cmd:'for', name_list_map: {v:['ok', '%s', 'ok2']}, tasks: [
          {cmd:'print', text:'<{v}>'},
        ]},
        {cmd:'print', text:'end'},
      ], named_tasks: {}, save_states: {} }
    """ % big
    runner = DeviceRunner(compile_src(src), CFG)
    final = runner.run(runner.make_instances(1), inner_steps=8,
                       max_rounds=60)
    r = runner.results(final)[0]
    capsys.readouterr()
    assert r.status == DONE
    assert r.output == f"<ok><{big}><ok2>end"
    assert r.output.count("<ok>") == 1  # iteration 1 ran exactly once
