"""Text-to-speech service: piper → pw-play subprocess pipeline.

Behavioral contract (reference: interpolation_engine.py:571-599, :669-737,
:1894-1972; sentence-buffered streaming as rust-project/src/runtime.rs:2185-2352):

* ``speak`` with empty text stops any current TTS.
* The voice is a Piper ``.onnx`` path (~-expanded, resolved relative to the
  program directory); its JSON config supplies sample rate / channel count.
* Exactly one TTS pipeline is live at a time, tracked globally and killed
  at exit.
* During chat streaming, visible fragments are written to piper's stdin;
  the :class:`TtsWriter` buffers to sentence boundaries ('.', '!', '?' or
  newline) before flushing so piper synthesizes whole sentences.
"""

from __future__ import annotations

import atexit
import json
import os
import shutil
import subprocess
import sys
from typing import Optional

from ..core.context import CTX

_current = {"piper": None, "player": None}


def stop_current_tts():
    piper = _current["piper"]
    player = _current["player"]
    if piper and piper.stdin:
        try:
            piper.stdin.close()
        except Exception:
            pass
    for proc in (piper, player):
        if proc:
            proc.terminate()
            try:
                proc.wait(timeout=1)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
    _current["piper"] = None
    _current["player"] = None


atexit.register(stop_current_tts)


def resolve_voice_path(voice_path: str) -> str:
    voice_path = os.path.expanduser(voice_path)
    if not os.path.isabs(voice_path):
        voice_path = os.path.join(CTX.program_dir or os.getcwd(), voice_path)
    return voice_path


def _voice_config(voice_path: str) -> tuple[Optional[str], int, int]:
    """Return (config_path, sample_rate, channels) for a Piper voice."""
    config_path = None
    if voice_path.endswith(".onnx") and os.path.exists(voice_path + ".json"):
        config_path = voice_path + ".json"
    elif os.path.exists(voice_path + ".onnx.json"):
        config_path = voice_path + ".onnx.json"
    rate, channels = 22050, 1
    if config_path:
        with open(config_path, "r", encoding="utf-8") as f:
            cfg = json.load(f)
        if isinstance(cfg, dict):
            audio = cfg.get("audio") if isinstance(cfg.get("audio"), dict) else {}
            rate = int(audio.get("sample_rate") or cfg.get("sample_rate") or rate)
            channels = int(audio.get("channels") or cfg.get("channels") or channels)
    return config_path, rate, channels


def start_pipeline(voice_path: str, voice_speaker=None):
    """Spawn piper|pw-play; returns the piper process (stdin accepts text)."""
    if not shutil.which("piper"):
        raise SystemExit("voice_path was set but 'piper' was not found on PATH.")
    if not shutil.which("pw-play"):
        raise SystemExit("voice_path was set but 'pw-play' was not found on PATH.")
    voice_path = resolve_voice_path(voice_path)
    if not os.path.exists(voice_path):
        raise SystemExit(f"voice_path does not exist: {voice_path}")
    if os.path.isdir(voice_path):
        raise SystemExit(f"voice_path is a directory, expected a file: {voice_path}")

    stop_current_tts()
    config_path, rate, channels = _voice_config(voice_path)

    piper_cmd = ["piper", "--model", voice_path, "--output-raw"]
    if voice_speaker is not None:
        piper_cmd += ["--speaker", str(voice_speaker)]
    if config_path:
        piper_cmd += ["--config", config_path]

    piper = subprocess.Popen(piper_cmd, stdin=subprocess.PIPE,
                             stdout=subprocess.PIPE, stderr=sys.stderr, text=False)
    if piper.stdin is None or piper.stdout is None:
        raise SystemExit("Failed to open Piper pipes")

    player = subprocess.Popen(
        ["pw-play", "-a", "--rate", str(rate), "--channels", str(channels),
         "--format", "s16", "-"],
        stdin=piper.stdout, stdout=sys.stdout, stderr=sys.stderr)
    piper.stdout.close()
    _current["piper"] = piper
    _current["player"] = player
    return piper


def speak(text: str, voice_path: str, voice_speaker=None):
    """The `speak` command: empty text stops TTS, else synthesize `text`."""
    if text == "":
        stop_current_tts()
        return
    piper = start_pipeline(voice_path, voice_speaker)
    try:
        piper.stdin.write(text.encode("utf-8"))
        piper.stdin.flush()
        piper.stdin.close()
    except BrokenPipeError:
        pass


_SENTENCE_ENDS = ".!?\n"


class TtsWriter:
    """Sentence-boundary buffered writer feeding a live piper stdin."""

    def __init__(self, piper_proc):
        self.piper = piper_proc
        self.buffer = ""

    def write(self, fragment: str):
        self.buffer += fragment
        cut = -1
        for i, ch in enumerate(self.buffer):
            if ch in _SENTENCE_ENDS:
                cut = i
        if cut >= 0:
            chunk, self.buffer = self.buffer[:cut + 1], self.buffer[cut + 1:]
            self._send(chunk)

    def flush(self):
        if self.buffer:
            self._send(self.buffer)
            self.buffer = ""

    def _send(self, text: str):
        if not self.piper or not self.piper.stdin:
            return
        try:
            self.piper.stdin.write(text.encode("utf-8"))
            self.piper.stdin.flush()
        except BrokenPipeError:
            pass
