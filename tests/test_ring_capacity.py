"""Capacity-park telemetry on the reference examples (VERDICT r2 next #7):
ring_stats must show that real programs run within the device capacities —
parks are BLOCKING IO, not capacity thrash. (text_adventure's device run is
covered in test_device_text_adventure; its ring traffic is chat/input.)"""

import asyncio

from interpolation_engine_tpu.compiler import compile_program
from interpolation_engine_tpu.io.manager import IOManager, ScriptedBackend
from interpolation_engine_tpu.programs.loader import invalidate_cache, load
from interpolation_engine_tpu.vm.config import (DONE, PARK_USER_CHOICE,
                                                PARK_USER_INPUT)
from interpolation_engine_tpu.vm.driver import DeviceRunner

from test_device_vm import CFG

EXAMPLES = "/root/reference/examples"


def run_example(path, responses):
    invalidate_cache()
    program, _ = load(path)
    compiled = compile_program(program)
    assert not compiled.host_only, compiled.host_only_reason
    runner = DeviceRunner(
        compiled, CFG,
        io_factory=lambda i: IOManager(ScriptedBackend(list(responses))))
    batch = runner.make_instances(1)
    final = runner.run(batch, inner_steps=16, max_rounds=500)
    return runner, runner.results(final)[0]


def test_hello_world_zero_ring_traffic(capsys):
    runner, r = run_example(f"{EXAMPLES}/hello_world.json5", [])
    capsys.readouterr()
    assert r.status == DONE
    assert r.output.strip() == "Hello, world!"
    assert runner.ring_stats["parks"] == 0
    assert runner.ring_stats["capacity_parks"] == 0


def test_math_zero_ring_traffic(capsys):
    runner, r = run_example(f"{EXAMPLES}/math.json5", [])
    capsys.readouterr()
    assert r.status == DONE
    assert r.output.strip() == "The result is 3!"
    assert runner.ring_stats["parks"] == 0
    assert runner.ring_stats["capacity_parks"] == 0


def test_interactivity_parks_are_blocking_io_only(capsys):
    runner, r = run_example(
        f"{EXAMPLES}/interactivity.json5",
        ["Ada", "1"])
    capsys.readouterr()
    assert r.status == DONE
    stats = runner.ring_stats
    assert stats["capacity_parks"] == 0, stats
    # every park is a user_input/user_choice — blocking IO, by design
    assert stats["parks"] > 0
    assert set(stats["parks_by_kind"]) <= {PARK_USER_INPUT,
                                           PARK_USER_CHOICE}, stats
