"""Interpolation core — the "ISA" of the VM.

Implements the exact observable semantics of the reference's interpolation
layer (reference: src/interpolation_engine/interpolation_engine.py:426-567,
:1436-1494), reproduced from its behavioral contract:

* ``{``/``}`` delimiters, ``\\`` escape; escaped braces are swapped to
  private sentinels while scanning so they survive interpolation unexpanded.
* "Simple insert keys" (a string that is exactly one balanced ``{...}``
  group) resolve to the raw stored value of any type; everything else
  stringifies.
* Innermost-first resolution (rightmost ``{``, next ``}``) makes nested keys
  like ``{question-{i}}`` work.
* Special keys ``HH:MM`` / ``HH:MM:SS`` and ``ARGn``; fallback lookup in an
  ``--inserts-dir`` directory (``<key>.json5`` parsed+escaped, else raw file).
* Missing keys raise :class:`InterpolationException`, catchable only through
  ``goto_map``/``replace_map`` ``NULL`` handling.

The device VM compiles these same semantics into byte-tensor kernels; this
module is the oracle they are differential-tested against.
"""

from __future__ import annotations

import os
from datetime import datetime

from .. import json5
from .context import (
    CTX,
    ESCAPE,
    INSERT_START,
    INSERT_STOP,
    SENTINEL_START,
    SENTINEL_STOP,
)


class InterpolationException(Exception):
    """A referenced insert key could not be resolved.

    Recoverable only via the ``NULL`` key of ``goto_map``/``replace_map``
    (reference behavior: interpolation_engine.py:426-428, :1700-1703).
    """


def py_str(value) -> str:
    """Python's ``str()`` for insert values.

    The reference stringifies interpolated values with ``str()``
    (interpolation_engine.py:531), so a list interpolated into a string
    context renders as Python's list repr. CPython's own ``str``/``repr``
    is the exact contract, so use it directly.
    """
    return str(value)


def str_preview(value) -> str:
    """Shortened repr used in log lines (reference: interpolation_engine.py:419-424)."""
    s = repr(value)
    if len(s) <= 45:
        return s
    return s[:20] + "[...]" + s[-20:]


def get_simple_insertkey(content):
    """Return the inner key if ``content`` is exactly one ``{...}`` group.

    A depth scan requires depth zero only at the very first and very last
    character (reference contract: interpolation_engine.py:477-495). Returns
    a falsy value ('' or None) otherwise — callers test truthiness.
    """
    if not isinstance(content, str):
        return None
    depth = 0
    last = len(content) - 1
    for i, c in enumerate(content):
        if c == INSERT_STOP:
            depth -= 1
        if (depth == 0) != (i == 0 or i == last):
            return None
        if c == INSERT_START:
            depth += 1
    return content[len(INSERT_START):-len(INSERT_STOP)]


def get_interpdata(inserts: dict, insertkey: str):
    """Resolve one insert key to its value.

    Resolution order (reference contract: interpolation_engine.py:430-467):
    special time keys, ARGn (with a tailored error), the inserts dict, then
    the optional inserts-dir (``<key>.json5`` parsed and recursively escaped,
    else the raw file stripped and escaped).
    """
    if insertkey == "HH:MM":
        return datetime.now().strftime("%H:%M")
    if insertkey == "HH:MM:SS":
        return datetime.now().strftime("%H:%M:%S")
    if insertkey.startswith("ARG") and insertkey[3:].isdigit():
        if insertkey not in inserts:
            raise InterpolationException(
                f"Argument interpolation key '{insertkey}' is used, but the "
                f"user passed less than {insertkey[3:]} program arguments.")
        return inserts[insertkey]
    if insertkey == "":
        raise InterpolationException("Tried to interpolate empty string ''.")

    if insertkey in inserts:
        return inserts[insertkey]
    if CTX.inserts_dir:
        json5_path = os.path.join(CTX.inserts_dir, f"{insertkey}.json5")
        raw_path = os.path.join(CTX.inserts_dir, insertkey)
        try:
            with open(json5_path) as f:
                return recursive_escape(json5.loads(f.read()))
        except FileNotFoundError:
            try:
                with open(raw_path) as f:
                    return recursive_escape(f.read().strip())
            except FileNotFoundError:
                pass
    missing_detail = " in interpdata"
    if CTX.inserts_dir:
        missing_detail += f" or inserts directory '{CTX.inserts_dir}'"
    raise InterpolationException(
        f"Could not find variable '{insertkey}'{missing_detail}. "
        f"Available interpolation data keys are {list(inserts.keys())}.")


def set_interpdata(inserts: dict, insertkey: str, value):
    inserts[insertkey] = value


def delete_interpdata(inserts: dict, insertkey: str):
    inserts.pop(insertkey, None)


def _swap_in_sentinels(content: str) -> str:
    return (content
            .replace(ESCAPE + INSERT_START, SENTINEL_START)
            .replace(ESCAPE + INSERT_STOP, SENTINEL_STOP))


def _swap_out_sentinels(content: str) -> str:
    return (content
            .replace(SENTINEL_START, ESCAPE + INSERT_START)
            .replace(SENTINEL_STOP, ESCAPE + INSERT_STOP))


def interpolate_inserts(inserts: dict, content: str):
    """Interpolate every ``{key}`` in ``content``; may return any type.

    Exactly mirrors the reference contract (interpolation_engine.py:497-541):
    sentinel-protect escapes, take the simple-key fast path (with one level
    of ``{{key}}`` indirection), else loop innermost-first substituting
    ``str(value)``, re-protecting escapes contributed by substituted values,
    and finally restore escape sequences (still escaped — unescaping is the
    program's explicit opt-in via the ``unescape`` command).
    """
    content = _swap_in_sentinels(content)

    insertkey = get_simple_insertkey(content)
    if insertkey:
        sub_insertkey = get_simple_insertkey(insertkey)
        if sub_insertkey:
            # {{name}} → look up the key named by the value of `name`.
            return get_interpdata(
                inserts,
                interpolate_inserts(inserts, INSERT_START + sub_insertkey + INSERT_STOP))
        return get_interpdata(inserts, interpolate_inserts(inserts, insertkey))

    while content.find(INSERT_START) != -1:
        n_starts = content.count(INSERT_START) - content.count(ESCAPE + INSERT_START)
        n_stops = content.count(INSERT_STOP) - content.count(ESCAPE + INSERT_STOP)
        assert n_starts == n_stops, (
            f"Error: The following content has {n_starts} '{INSERT_START}' and "
            f"{n_stops} '{INSERT_STOP}':\n\n\"\"\"{content}\n\"\"\"")
        # innermost-first: the LAST '{' pairs with the next '}' after it
        open_at = content.rfind(INSERT_START)
        close_at = content.find(INSERT_STOP, open_at + len(INSERT_START))
        if open_at == -1 or close_at == -1:
            break
        key_start = open_at + len(INSERT_START)
        group_end = close_at + len(INSERT_STOP)
        insertkey = _swap_out_sentinels(content[key_start:close_at])
        insertvalue = get_interpdata(inserts, insertkey)
        assert type(insertvalue) in (str, int, list), (
            f"Error: trying to interpolate variable '{insertkey}' of type "
            f"{type(insertvalue)} into a string.")
        content = content[:open_at] + py_str(insertvalue) + content[group_end:]
        content = _swap_in_sentinels(content)

    return _swap_out_sentinels(content)


def interpolate_messages(inserts: dict, messages: list) -> list:
    """Interpolate chat messages, stripping content (reference: :544-551)."""
    out = []
    for message in messages:
        content = interpolate_inserts(inserts, message["content"])
        out.append({"role": message["role"], "content": content.strip()})
    return out


def recursive_unescape(x):
    """Strip one level of brace escaping from nested str/list/dict values."""
    if isinstance(x, str):
        return (x
                .replace(ESCAPE + INSERT_START, INSERT_START)
                .replace(ESCAPE + INSERT_STOP, INSERT_STOP))
    if isinstance(x, list):
        return [recursive_unescape(v) for v in x]
    if isinstance(x, dict):
        return {recursive_unescape(k): recursive_unescape(v) for k, v in x.items()}
    return x


def recursive_escape(x):
    """Escape every brace in nested str/list/dict values."""
    if isinstance(x, str):
        return (x
                .replace(INSERT_START, ESCAPE + INSERT_START)
                .replace(INSERT_STOP, ESCAPE + INSERT_STOP))
    if isinstance(x, list):
        return [recursive_escape(v) for v in x]
    if isinstance(x, dict):
        return {recursive_escape(k): recursive_escape(v) for k, v in x.items()}
    return x


def recursive_interpolate(inserts: dict, x):
    """Interpolate a whole task structure, with the reference's carve-outs.

    ``goto_map``/``replace_map`` bodies are returned untouched (they
    interpolate lazily so NULL-handling can catch errors), and block tasks
    (``for``/``serial``/``parallel_*``) only resolve simple-insert
    placeholders in their task *lists*, never the subtask contents
    (reference contract: interpolation_engine.py:1462-1494).
    """
    import copy

    if get_simple_insertkey(x):
        return recursive_interpolate(inserts, interpolate_inserts(inserts, x))
    if isinstance(x, str):
        return interpolate_inserts(inserts, x)
    if isinstance(x, list):
        return [recursive_interpolate(inserts, v) for v in x]
    if isinstance(x, dict):
        cmd = x.get("cmd")
        if cmd in ("goto_map", "replace_map"):
            return x
        if cmd in ("for", "serial", "parallel_wait", "parallel_race"):
            x = copy.deepcopy(x)
            key = get_simple_insertkey(x["tasks"])
            if key:
                x["tasks"] = get_interpdata(inserts, key)
            for i in range(len(x["tasks"])):
                sub_key = get_simple_insertkey(x["tasks"][i])
                if sub_key:
                    x["tasks"][i] = get_interpdata(inserts, sub_key)
            return x
        return {recursive_interpolate(inserts, k): recursive_interpolate(inserts, v)
                for k, v in x.items()}
    return x
