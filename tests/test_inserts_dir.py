"""--inserts-dir behavior: host lazy fallback and device preload agree."""

import asyncio

import pytest

from interpolation_engine_tpu.compiler import compile_program
from interpolation_engine_tpu.core.context import CTX
from interpolation_engine_tpu.core.runtime import async_main
from interpolation_engine_tpu.io.manager import IOManager, ScriptedBackend
from interpolation_engine_tpu import json5
from interpolation_engine_tpu.programs.loader import add_line_numbers
from interpolation_engine_tpu.programs.validator import validate_program
from interpolation_engine_tpu.vm.config import DONE
from interpolation_engine_tpu.vm.driver import DeviceRunner

from test_device_vm import CFG

SRC = """
{
    default_state: {order_index: 1, inserts: {local: 'from-state'}},
    order: [
        {cmd:'print', text:'{local}/{greeting}/{data}'},
    ],
    named_tasks: {}, save_states: {},
}
"""


@pytest.fixture
def inserts_dir(tmp_path):
    d = tmp_path / "inserts"
    d.mkdir()
    (d / "greeting").write_text("hi there\n")
    (d / "data.json5").write_text("'from-json5'")
    (d / "local").write_text("SHADOWED")  # state insert takes precedence
    CTX.inserts_dir = str(d)
    yield str(d)
    CTX.inserts_dir = None


def test_host_inserts_dir(tmp_path, inserts_dir, capsys):
    p = tmp_path / "p.json5"
    p.write_text(SRC)
    state = asyncio.run(async_main(str(p), [], IOManager(ScriptedBackend())))
    assert state["output"] == "from-state/hi there/from-json5"
    capsys.readouterr()


def test_device_inserts_dir(tmp_path, inserts_dir, capsys):
    program = json5.loads(add_line_numbers(SRC))
    program.setdefault("named_tasks", {})
    validate_program(program)
    compiled = compile_program(program)
    runner = DeviceRunner(compiled, CFG)
    batch = runner.make_instances(2)
    final = runner.run(batch, inner_steps=8)
    for r in runner.results(final):
        assert r.status == DONE
        assert r.output == "from-state/hi there/from-json5"
    capsys.readouterr()
