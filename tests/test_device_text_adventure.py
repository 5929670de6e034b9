"""text_adventure on the DEVICE engine: compute on device, parallel/chat/IO
through the host ring. Must reproduce the host-engine two-turn run exactly."""

import asyncio

import pytest

from interpolation_engine_tpu.compiler import compile_program
from interpolation_engine_tpu.io.manager import IOManager
from interpolation_engine_tpu.programs.loader import load, invalidate_cache
from interpolation_engine_tpu.vm.config import VMConfig
from interpolation_engine_tpu.vm.driver import DeviceRunner

from fake_sse_server import FakeSSEServer
from test_text_adventure import BlockingScriptedBackend, make_adventure_program

# Reuse test_device_vm's config so the per-handler compilations are shared;
# strings that outgrow these capacities fall back to host execution via the
# ring — exercising exactly the graceful-degradation path we want covered.
from test_device_vm import CFG  # noqa: E402


def responder(body):
    user = body["messages"][-1]["content"]
    if "Write the best possible starting output" in user:
        return "<output>You wake in a cold cabin.</output>"
    if "next output in response to the player's last action" in user:
        return "<output>The door creaks open.</output>"
    if "<query>" in user:
        return "<output>It is the year 3021.</output>"
    return "<output>???</output>"


def test_text_adventure_compiles_for_device(tmp_path):
    invalidate_cache()
    program, _ = load("/root/reference/examples/text_adventure.json5")
    compiled = compile_program(program)
    assert not compiled.host_only, compiled.host_only_reason


@pytest.mark.parametrize("mode", [
    "eager",
    pytest.param("jit", marks=pytest.mark.slow),  # ~44 s compile
])
def test_device_text_adventure_two_turns(tmp_path, capsys, mode):
    """Both device dispatch modes: 'eager' (per-handler concrete stepping)
    and 'jit' (the compiled run_batch loop — the ONLY path that ever runs
    on a TPU, so it needs end-to-end coverage, not just liveness)."""
    counter = {"n": 0}

    def counting_responder(body):
        counter["n"] += 1
        return responder(body)

    async def go():
        async with FakeSSEServer(counting_responder, chunk_size=2) as server:
            path = make_adventure_program(tmp_path, server.url)
            invalidate_cache()
            program, _ = load(path)
            compiled = compile_program(program)
            assert not compiled.host_only

            backend = BlockingScriptedBackend([
                "A lonely arctic outpost.",
                "open the door",
                "(what year is it)",
            ])
            runner = DeviceRunner(compiled, CFG, mode=mode,
                                  io_factory=lambda i: IOManager(backend))
            batch = runner.make_instances(1)
            task = asyncio.create_task(
                runner.run_async(batch, inner_steps=16, max_rounds=2000))
            for _ in range(600):
                await asyncio.sleep(0.1)
                if not backend.responses and counter["n"] >= 3:
                    break
            await asyncio.sleep(0.5)
            task.cancel()
            try:
                batch2 = await task
            except asyncio.CancelledError:
                batch2 = None
            return backend

    backend = asyncio.run(go())
    capsys.readouterr()

    # the run quiesced at turn 3 like the host engine: scripted inputs all
    # consumed, three chat calls served, history pipeline rendered on screen
    assert backend.responses == []
    assert "You wake in a cold cabin." in backend.output_text
    assert "> open the door" in backend.output_text
    assert "? (what year is it)" in backend.output_text
    assert "<action>" not in backend.output_text


def test_turbo_text_adventure_two_turns(tmp_path, capsys):
    """The flagship program on the TURBO engine end-to-end: compute in the
    mega-kernel until the race block's blocking lanes park, service the
    lanes through the TURBO ring (no escape — the instance stays batched),
    and reproduce the host-engine turn transcript. Eligibility alone
    (test_turbo.py) doesn't prove the run."""
    from interpolation_engine_tpu.vm.turbo import TurboConfig, TurboEngine

    counter = {"n": 0}

    def counting_responder(body):
        counter["n"] += 1
        return responder(body)

    async def go():
        async with FakeSSEServer(counting_responder, chunk_size=2) as server:
            path = make_adventure_program(tmp_path, server.url)
            invalidate_cache()
            program, _ = load(path)
            compiled = compile_program(program)
            assert not compiled.host_only

            backend = BlockingScriptedBackend([
                "A lonely arctic outpost.",
                "open the door",
                "(what year is it)",
            ])
            tcfg = TurboConfig(tile=8, width=128, out_width=256, k_steps=16)
            engine = TurboEngine(compiled, tcfg,
                                 io_factory=lambda i: IOManager(backend))
            batch = engine.make_batch(1)
            task = asyncio.create_task(
                engine.run_async(batch, max_rounds=5000))
            for _ in range(600):
                await asyncio.sleep(0.1)
                if not backend.responses and counter["n"] >= 3:
                    break
            await asyncio.sleep(0.5)
            task.cancel()
            try:
                await task
            except asyncio.CancelledError:
                pass
            await engine._lanering.cancel_all()
            # round-4 contract: mid-race blocking IO stays ON turbo —
            # zero migrations off the batched path
            assert not engine._escape_results
            assert not engine._promote_states
            assert not engine._escape_states
            return backend

    backend = asyncio.run(go())
    capsys.readouterr()

    assert backend.responses == []
    assert "You wake in a cold cabin." in backend.output_text
    assert "> open the door" in backend.output_text
    assert "? (what year is it)" in backend.output_text
    assert "<action>" not in backend.output_text
