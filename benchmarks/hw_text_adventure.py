"""One-off hardware validation: text_adventure.json5 two scripted turns on
the TURBO engine on the real device (no platform override) — the same flow
as tests/test_device_text_adventure.py::test_turbo_text_adventure_two_turns,
which runs interpret-mode on CPU. Prints the transcript checks and leaves
the program's kernel executable in the AOT cache.
"""

import asyncio
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_ie_tpu")

from interpolation_engine_tpu.compiler import compile_program
from interpolation_engine_tpu.io.manager import IOManager
from interpolation_engine_tpu.programs.loader import invalidate_cache, load
from interpolation_engine_tpu.vm.turbo import TurboConfig, TurboEngine

from fake_sse_server import FakeSSEServer
from test_text_adventure import BlockingScriptedBackend, make_adventure_program
from test_device_text_adventure import responder


def main():
    counter = {"n": 0}

    def counting_responder(body):
        counter["n"] += 1
        return responder(body)

    async def go():
        tmp = tempfile.mkdtemp()
        async with FakeSSEServer(counting_responder, chunk_size=2) as server:
            from pathlib import Path
            path = make_adventure_program(Path(tmp), server.url)
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
            print(f"platform={jax.devices()[0].platform} "
                  f"interpret={engine.interpret}", flush=True)
            batch = engine.make_batch(1)
            task = asyncio.create_task(
                engine.run_async(batch, max_rounds=5000))
            for k in range(2400):
                await asyncio.sleep(0.5)
                if k % 60 == 0:
                    print(f"  poll {k}: chats={counter['n']} "
                          f"responses_left={len(backend.responses)} "
                          f"escapes={engine.ring_stats['escapes']}",
                          flush=True)
                if not backend.responses and counter["n"] >= 3:
                    break
            await asyncio.sleep(1.0)
            task.cancel()
            try:
                await task
            except asyncio.CancelledError:
                pass
            for t in engine._promo_tasks:
                t.cancel()
            return backend

    backend = asyncio.run(go())
    ok = (backend.responses == []
          and "You wake in a cold cabin." in backend.output_text
          and "> open the door" in backend.output_text
          and "? (what year is it)" in backend.output_text
          and "<action>" not in backend.output_text)
    print(f"chat_calls={counter['n']} responses_left={backend.responses}")
    print("TRANSCRIPT OK" if ok else
          f"TRANSCRIPT MISMATCH:\n{backend.output_text!r}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
