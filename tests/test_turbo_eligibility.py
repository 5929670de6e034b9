"""The turbo-eligibility boundary, enumerated (VERDICT r4 next #6).

The turbo engine's eligibility contract lives in the header of
compiler/turbo.py: anything whose *state shape* fits the static slot
model plans natively; everything else must raise ``NotTurbo`` (and run on
the general engine with byte-exact host parity), never mis-run. These
tests pin BOTH sides of the boundary:

* every ``raise NotTurbo`` site in compiler/turbo.py fires for its
  construct, with its exact reason prefix — if the boundary silently
  narrows (a construct starts planning that shouldn't) a test fails;
* the canary programs (and all four reference examples) stay eligible —
  if the boundary silently widens (a supported construct starts getting
  rejected) a test fails;
* a rejected program still runs: the general engine reproduces the host
  byte-for-byte on a representative ineligible program.
"""

import pytest

from interpolation_engine_tpu.compiler import compile_program
from interpolation_engine_tpu.compiler.turbo import (
    MAX_INSTRS, MAX_SLOTS, NotTurbo, plan_turbo)
from interpolation_engine_tpu.programs.loader import invalidate_cache, load
from interpolation_engine_tpu.vm.config import DONE

from test_device_vm import compile_src


def _plan(src: str):
    return plan_turbo(compile_src(src))


# ---------------------------------------------------------------------------
# ineligible constructs — one test per NotTurbo raise site
# ---------------------------------------------------------------------------

INELIGIBLE = [
    # (construct id, program source, NotTurbo reason prefix)
    ("bool_default_insert",
     """{default_state: {order_index: 1, inserts: {b: true}},
         order: [{cmd:'print', text:'x'}],
         named_tasks: {}, save_states: {}}""",
     "bool default insert"),
    ("dict_default_insert",
     """{default_state: {order_index: 1, inserts: {d: {a: 1}}},
         order: [{cmd:'print', text:'x'}],
         named_tasks: {}, save_states: {}}""",
     "unsupported default insert"),
    ("nested_list_insert",
     """{default_state: {order_index: 1, inserts: {l: [['x'],['y']]}},
         order: [{cmd:'print', text:'x'}],
         named_tasks: {}, save_states: {}}""",
     "nested/non-scalar element in default insert"),
    ("bool_in_for_list",
     """{default_state: {order_index: 1, inserts: {}},
         order: [{cmd:'for', name_list_map: {v: [true, false]},
                  tasks: [{cmd:'print', text:'{v}'}]}],
         named_tasks: {}, save_states: {}}""",
     "nested/non-scalar element in for list"),
    ("for_over_non_list",
     """{default_state: {order_index: 1, inserts: {}},
         order: [{cmd:'for', name_list_map: {v: 3},
                  tasks: [{cmd:'print', text:'{v}'}]}],
         named_tasks: {}, save_states: {}}""",
     "for over a non-list"),
    ("set_of_dict_item",
     """{default_state: {order_index: 1, inserts: {}},
         order: [{cmd:'set', item: {a: 1}, output_name:'d'},
                 {cmd:'print', text:'x'}],
         named_tasks: {}, save_states: {}}""",
     "set of a dict item"),
    ("dynamic_output_name",
     """{default_state: {order_index: 1, inserts: {k: 'n'}},
         order: [{cmd:'set', item:'v', output_name:'{k}'}],
         named_tasks: {}, save_states: {}}""",
     "dynamic output_name"),
    ("mixed_list_scalar_slot",
     """{default_state: {order_index: 1, inserts: {x: 'a'}},
         order: [{cmd:'set', item:['l'], output_name:'x'},
                 {cmd:'print', text:'{x}'}],
         named_tasks: {}, save_states: {}}""",
     "slots hold both list and scalar"),
    ("recursive_run_task_host_only",
     """{default_state: {order_index: 1, inserts: {}},
         order: [{cmd:'run_task', task_name:'loop'}],
         named_tasks: {loop: {cmd:'run_task', task_name:'loop',
                              traceback_label:'t'}},
         save_states: {}}""",
     "host_only: recursive run_task"),
]


@pytest.mark.parametrize("cid,src,reason",
                         INELIGIBLE, ids=[c[0] for c in INELIGIBLE])
def test_ineligible_construct_raises(cid, src, reason):
    with pytest.raises(NotTurbo) as exc:
        _plan(src)
    assert str(exc.value).startswith(reason), \
        f"{cid}: reason changed: {exc.value!r}"


def test_too_many_instructions():
    body = ",".join(f"{{cmd:'print', text:'{i}'}}"
                    for i in range(MAX_INSTRS + 1))
    src = ("{default_state: {order_index: 1, inserts: {}}, order: ["
           + body + "], named_tasks: {}, save_states: {}}")
    with pytest.raises(NotTurbo, match="instructions >"):
        _plan(src)


def test_too_many_insert_keys():
    body = ",".join(f"{{cmd:'set', item:'v', output_name:'k{i}'}}"
                    for i in range(MAX_SLOTS + 1))
    src = ("{default_state: {order_index: 1, inserts: {}}, order: ["
           + body + "], named_tasks: {}, save_states: {}}")
    with pytest.raises(NotTurbo, match="too many insert keys"):
        _plan(src)


def test_ineligible_program_runs_on_general_engine(tmp_path, capsys):
    """Rejection is a routing decision, not a failure: the same program
    must run on the general VM and match the host byte-for-byte."""
    src = """
    {
        default_state: {order_index: 1, inserts: {x: 'a'}},
        order: [
            {cmd:'print', text:'x={x}'},
            {cmd:'set', item:['l', 'm'], output_name:'x'},
            {cmd:'print', text:' then {x}'},
        ],
        named_tasks: {}, save_states: {},
    }
    """
    from test_device_vm import run_device, run_host
    with pytest.raises(NotTurbo):
        _plan(src)
    host = run_host(src, tmp_path)
    capsys.readouterr()
    results, _runner = run_device(src, n=2)
    for r in results:
        assert r.status == DONE
        assert r.output == host["output"]


# ---------------------------------------------------------------------------
# eligible canaries — the boundary must not silently widen
# ---------------------------------------------------------------------------

ELIGIBLE = [
    ("lists_and_ops",
     """{default_state: {order_index: 1, inserts: {l: ['a', 'b']}},
         order: [{cmd:'list_append', list:'{l}', item:'c',
                  output_name:'l'},
                 {cmd:'list_join', list:'{l}', before:'', between:',',
                  after:'', output_name:'s'},
                 {cmd:'print', text:'{s}'}],
         named_tasks: {}, save_states: {}}"""),
    ("literal_for",
     """{default_state: {order_index: 1, inserts: {}},
         order: [{cmd:'for', name_list_map: {v: [1, 2, 3]},
                  tasks: [{cmd:'print', text:'{v}'}]}],
         named_tasks: {}, save_states: {}}"""),
    ("dynamic_for_over_slot",
     """{default_state: {order_index: 1, inserts: {l: ['x', 'y']}},
         order: [{cmd:'for', name_list_map: {v: '{l}'},
                  tasks: [{cmd:'print', text:'{v}'}]}],
         named_tasks: {}, save_states: {}}"""),
    ("parallel_race_with_await",
     """{default_state: {order_index: 1, inserts: {}},
         order: [{cmd:'parallel_race', tasks:[
                     {cmd:'set', item:'w', output_name:'won'},
                     {cmd:'serial', tasks:[
                         {cmd:'await_insert', name:'won'},
                         {cmd:'print', text:'saw {won}'},
                     ]}]},
                 {cmd:'print', text:'{won}'}],
         named_tasks: {}, save_states: {}}"""),
    ("parallel_wait_user_input",
     """{default_state: {order_index: 1, inserts: {}},
         order: [{cmd:'parallel_wait', tasks:[
                     {cmd:'user_input', prompt:'p', output_name:'u'},
                     {cmd:'set', item:'s', output_name:'v'}]},
                 {cmd:'print', text:'{u}{v}'}],
         named_tasks: {}, save_states: {}}"""),
    ("run_task_non_recursive",
     """{default_state: {order_index: 1, inserts: {}},
         order: [{cmd:'run_task', task_name:'greet'}],
         named_tasks: {greet: {cmd:'print', text:'hi'}},
         save_states: {}}"""),
    ("goto_map_wildcards",
     """{default_state: {order_index: 1, inserts: {v: 'hello'}},
         order: [{cmd:'goto_map', text:'{v}', target_maps:[
                     {'he*': '@a'}, {'*': '@b'}]},
                 {cmd:'label', name:'@a'},
                 {cmd:'print', text:'prefix'},
                 {cmd:'goto', name:'@end'},
                 {cmd:'label', name:'@b'},
                 {cmd:'print', text:'star'},
                 {cmd:'label', name:'@end'}],
         named_tasks: {}, save_states: {}}"""),
    ("math_and_interp",
     """{default_state: {order_index: 1, inserts: {a: 2}},
         order: [{cmd:'math', input:'{a} * 21', output_name:'r'},
                 {cmd:'print', text:'r={r}'}],
         named_tasks: {}, save_states: {}}"""),
]


@pytest.mark.parametrize("cid,src", ELIGIBLE, ids=[c[0] for c in ELIGIBLE])
def test_eligible_canary_plans(cid, src):
    plan = _plan(src)
    assert plan.n_instr > 0


@pytest.mark.parametrize("example", [
    "hello_world", "math", "interactivity", "text_adventure"])
def test_reference_examples_stay_eligible(example):
    """All four reference examples plan natively (SURVEY.md §2.5) —
    the flagship must never silently fall off the turbo path."""
    invalidate_cache()
    program, _ = load(f"/root/reference/examples/{example}.json5")
    compiled = compile_program(program)
    assert not compiled.host_only, compiled.host_only_reason
    plan = plan_turbo(compiled)
    assert plan.n_instr == compiled.n_instr
