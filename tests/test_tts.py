"""TTS pipeline with STUB binaries (VERDICT r4 next #7): fake `piper` /
`pw-play` executables on PATH exercise the real subprocess plumbing —
voice-config JSON parsing, arg assembly, sentence-boundary buffering, and
pipeline teardown — without the actual models.

Reference contract: interpolation_engine.py:571-599 (speak / pipeline
spawn, --speaker, config discovery), :1894-1972 (streamed TTS writes);
sentence buffering as rust-project/src/runtime.rs:2185-2352.
"""

import json
import os
import stat
import subprocess
import time

import pytest

from interpolation_engine_tpu.io import tts


PIPER_STUB = """#!/bin/sh
printf '%s\\n' "$@" > "$TTS_TEST_DIR/piper_args"
exec cat
"""

PWPLAY_STUB = """#!/bin/sh
printf '%s\\n' "$@" > "$TTS_TEST_DIR/pwplay_args"
exec cat > "$TTS_TEST_DIR/pcm_out"
"""


@pytest.fixture
def stub_bins(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    for name, body in (("piper", PIPER_STUB), ("pw-play", PWPLAY_STUB)):
        p = bindir / name
        p.write_text(body)
        p.chmod(p.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    monkeypatch.setenv("TTS_TEST_DIR", str(tmp_path))
    yield tmp_path
    tts.stop_current_tts()


def make_voice(tmp_path, rate=16000, channels=2):
    voice = tmp_path / "voice.onnx"
    voice.write_bytes(b"onnx")
    (tmp_path / "voice.onnx.json").write_text(json.dumps(
        {"audio": {"sample_rate": rate, "channels": channels}}))
    return str(voice)


def _wait_pipeline_drained(tmp_path, timeout=5.0):
    """speak() closes piper's stdin; the stub pipeline then runs to EOF."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        piper, player = tts._current["piper"], tts._current["player"]
        if piper is not None and piper.poll() is not None and \
                player is not None and player.poll() is not None:
            return
        time.sleep(0.02)
    raise AssertionError("stub pipeline did not drain")


def test_speak_pipes_text_through_piper_to_player(stub_bins):
    voice = make_voice(stub_bins)
    tts.speak("Hello there.", voice, voice_speaker=3)
    _wait_pipeline_drained(stub_bins)
    # piper got --model/<voice>, --output-raw, --speaker 3, --config
    args = (stub_bins / "piper_args").read_text().splitlines()
    assert args[args.index("--model") + 1] == voice
    assert "--output-raw" in args
    assert args[args.index("--speaker") + 1] == "3"
    assert args[args.index("--config") + 1] == voice + ".json"
    # pw-play got the config JSON's rate/channels and s16 format
    pargs = (stub_bins / "pwplay_args").read_text().splitlines()
    assert pargs[pargs.index("--rate") + 1] == "16000"
    assert pargs[pargs.index("--channels") + 1] == "2"
    assert pargs[pargs.index("--format") + 1] == "s16"
    # the text flowed piper(stub cat) → pw-play stdin
    assert (stub_bins / "pcm_out").read_bytes() == b"Hello there."


def test_voice_config_defaults_without_json(stub_bins):
    voice = stub_bins / "plain.onnx"
    voice.write_bytes(b"onnx")
    tts.speak("x.", str(voice))
    _wait_pipeline_drained(stub_bins)
    pargs = (stub_bins / "pwplay_args").read_text().splitlines()
    assert pargs[pargs.index("--rate") + 1] == "22050"   # piper default
    assert pargs[pargs.index("--channels") + 1] == "1"
    args = (stub_bins / "piper_args").read_text().splitlines()
    assert "--config" not in args and "--speaker" not in args


def test_empty_speak_stops_pipeline(stub_bins):
    voice = make_voice(stub_bins)
    piper = tts.start_pipeline(voice)
    assert piper.poll() is None
    player = tts._current["player"]
    tts.speak("", voice)          # empty text = stop, never respawn
    assert piper.wait(timeout=5) is not None
    assert player.wait(timeout=5) is not None
    assert tts._current["piper"] is None
    assert tts._current["player"] is None
    # nothing was synthesized (the stub creates the file at exec time)
    assert (stub_bins / "pcm_out").read_bytes() == b""


def test_new_speak_replaces_live_pipeline(stub_bins):
    """Exactly one pipeline is live at a time: a second speak kills the
    first pair before spawning (the atexit hook runs the same stop)."""
    voice = make_voice(stub_bins)
    first = tts.start_pipeline(voice)
    tts.speak("Second sentence.", voice)
    assert first.wait(timeout=5) is not None   # old piper was terminated
    _wait_pipeline_drained(stub_bins)
    assert (stub_bins / "pcm_out").read_bytes() == b"Second sentence."


def test_missing_binaries_exit(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path))  # nothing on PATH
    with pytest.raises(SystemExit, match="piper"):
        tts.start_pipeline(str(tmp_path / "v.onnx"))


def test_missing_voice_file_exits(stub_bins):
    with pytest.raises(SystemExit, match="does not exist"):
        tts.start_pipeline(str(stub_bins / "nope.onnx"))


def test_tts_writer_buffers_to_sentence_boundary(stub_bins):
    """Streamed fragments flush at the LAST sentence end ('.', '!', '?',
    newline) seen so far; flush() drains any tail — so piper always
    receives whole sentences."""
    voice = make_voice(stub_bins)
    piper = tts.start_pipeline(voice)
    w = tts.TtsWriter(piper)
    w.write("Hel")
    w.write("lo. Wor")        # boundary inside → "Hello." goes out
    w.write("ld! And mo")     # "' Wor' + 'ld!'" goes out
    w.flush()                 # tail "And mo" forced out
    piper.stdin.close()
    _wait_pipeline_drained(stub_bins)
    assert (stub_bins / "pcm_out").read_bytes() == b"Hello. World! And mo"


def test_tts_writer_no_flush_without_boundary(stub_bins):
    voice = make_voice(stub_bins)
    piper = tts.start_pipeline(voice)
    w = tts.TtsWriter(piper)
    w.write("no boundary yet")
    assert w.buffer == "no boundary yet"      # nothing sent
    w.write(" until now.\nplus tail")
    assert w.buffer == "plus tail"            # cut at last boundary
    w.flush()
    piper.stdin.close()
    _wait_pipeline_drained(stub_bins)
    assert (stub_bins / "pcm_out").read_bytes() == \
        b"no boundary yet until now.\nplus tail"


def test_speak_command_through_host_executor(stub_bins, tmp_path, capfd):
    """The `speak` command end-to-end through the host engine (the same
    entry the CLI uses), not just the tts module. capfd (not capsys):
    the pipeline wires pw-play to the REAL sys.stdout fd. The runtime
    stops any live TTS at end-of-order (core/runtime.py:178), so the
    assertions here are the spawn (args file, written at stub exec) and
    the teardown — synthesized-byte flow is pinned by the direct speak
    test above, where nothing races the pipeline."""
    import asyncio
    from interpolation_engine_tpu.core.runtime import async_main
    from interpolation_engine_tpu.io.manager import IOManager, ScriptedBackend
    voice = make_voice(stub_bins)
    prog = tmp_path / "speak.json5"
    prog.write_text("""
    {
        default_state: {order_index: 1, inserts: {what: 'TPU says hi.'}},
        order: [
            {cmd:'speak', text:'{what}', voice_path:'%s'},
            {cmd:'print', text:'spoke'},
        ],
        named_tasks: {}, save_states: {},
    }
    """ % voice)
    state = asyncio.run(async_main(str(prog), [], IOManager(
        ScriptedBackend([]))))
    capfd.readouterr()
    assert state["output"] == "spoke"
    # the pipeline was spawned with the interpolated voice... (poll: on a
    # loaded box the stub shell may not have written its args file yet —
    # and SIGTERM from the end-of-order stop can beat the exec entirely,
    # in which case Popen still proves the spawn; the args check is
    # best-effort)
    deadline = time.time() + 5
    while not (stub_bins / "piper_args").exists() and time.time() < deadline:
        time.sleep(0.05)
    if (stub_bins / "piper_args").exists():
        args = (stub_bins / "piper_args").read_text().splitlines()
        assert args[args.index("--model") + 1] == voice
    # ...and end-of-order stopped it (reference kills TTS at exit)
    assert tts._current["piper"] is None
    assert tts._current["player"] is None
