"""The 31-command host executor (single-instance oracle interpreter).

Executes one task against a mutable state dict, returning ``None`` to advance
or ``{'goto_target': label}`` to jump (reference contract:
interpolation_engine.py:1497-2043). Nested ``serial``/``for`` blocks keep
their own 1-based cursors in the state dict under
``order_index/<runtime_label>`` (and ``.../counter`` for ``for``) so a saved
state resumes mid-block; ``parallel_race`` cancels losers and purges their
sub-cursors (reference contract: :1594-1626, rust-project/src/runtime.rs:900-926).

The device VM compiles the same semantics to a static instruction table;
this executor is the differential oracle and the host fallback path.
"""

from __future__ import annotations

import asyncio
import copy
import os
import random

from .. import json5
from ..io import tts as tts_mod
from ..chat.service import run_chat
from .context import CTX, ESCAPE, INSERT_START, INSERT_STOP, log, log_enabled
from .interp import (
    InterpolationException,
    get_interpdata,
    get_simple_insertkey,
    interpolate_inserts,
    py_str,
    recursive_interpolate,
    recursive_unescape,
    set_interpdata,
    delete_interpdata,
    str_preview,
)
from .math_eval import eval_math
from .wildcard import get_wildcard_matches, is_wildcard_match
from .events import EVENTS


class Runtime:
    """Per-program execution services shared by all tasks."""

    def __init__(self, io, completion_args=None, named_tasks=None):
        self.io = io
        self.completion_args = completion_args if completion_args is not None else {}
        self.named_tasks = named_tasks if named_tasks is not None else {}


def task_preview(task: dict) -> str:
    return ", ".join(f"{k}={str_preview(v)}" for k, v in task.items()
                     if k != "traceback_label")


def _ensure_traceback_labels(tasks: list):
    """Runtime-added tasks may lack provenance labels; synthesize them."""
    for i, sub in enumerate(tasks):
        sub["traceback_label"] = sub.get(
            "traceback_label", f"({sub['cmd']}-{sub.get('line', i + 1)})")


def _label_jump_index(tasks: list, goto_target: str) -> int:
    """1-based index just past the matching label (reference: :1646-1648)."""
    return 2 + min(
        i for i in range(len(tasks))
        if tasks[i]["cmd"] == "label" and tasks[i]["name"] == goto_target)


async def _run_task_list(rt: Runtime, state: dict, tasks: list, runtime_label: str):
    """Run a sub-order with its own resumable 1-based cursor."""
    sub_index_label = f"order_index/{runtime_label}"
    state[sub_index_label] = state.get(sub_index_label, 1)
    while state[sub_index_label] <= len(tasks):
        subtask = tasks[state[sub_index_label] - 1]
        result = await execute_task(
            rt, state, subtask, f"{runtime_label}/{subtask['traceback_label']}")
        if result is None:
            state[sub_index_label] += 1
        elif isinstance(result, dict) and "goto_target" in result:
            state[sub_index_label] = _label_jump_index(tasks, result["goto_target"])
        else:
            raise Exception(
                f"{subtask['traceback_label']}: Task returned unexpected value: "
                f"{result}.")
    del state[sub_index_label]


def _py_index(_list: list, index) -> int:
    """1-based element index (negatives from the end) → Python index."""
    index = int(index) if isinstance(index, str) else index
    if isinstance(index, int) and not isinstance(index, bool):
        if index > 0:
            return index - 1
        if index < 0:
            return len(_list) + index
    raise Exception(
        f"Program lists cannot be indexed with '{index}'. Programs are "
        f"1-indexed.")


def _py_slice_index(_list: list, index, *, right: bool = False):
    """1-based slice bound → Python index (reference: :1543-1554).

    Quirk preserved: a right bound of 0 maps to Python index 0 (so with the
    later +1 the slice keeps the first element) — the reference's Rust
    sibling instead yields an empty slice; the Python behavior wins for
    stdout parity.
    """
    index = int(index) if isinstance(index, str) else index
    if isinstance(index, int) and not isinstance(index, bool):
        if index > 0:
            return index - 1
        if index < 0:
            return len(_list) + index
        if right:
            return 0
        raise Exception("Lower index of slice cannot be 0. Programs are 1-indexed.")
    return None


async def execute_task(rt: Runtime, state: dict, task: dict, runtime_label: str):
    inserts = state["inserts"]
    if log_enabled():  # task_preview is costly; skip it without --log
        log(f"🛈  Order Item {task['traceback_label']}:  "
            f"{task_preview(task)}", flush=True)
    EVENTS.task_start(task)

    task = recursive_interpolate(inserts, task)
    cmd = task["cmd"]

    # ---- insert/list data ops ----------------------------------------------

    if cmd == "list_join":
        set_interpdata(inserts, task["output_name"],
                       task["before"] + task["between"].join(task["list"])
                       + task["after"])

    elif cmd == "list_concat":
        out: list = []
        for sub in task["lists"]:
            out = out + sub
        set_interpdata(inserts, task["output_name"], out)

    elif cmd == "list_append":
        set_interpdata(inserts, task["output_name"],
                       task["list"] + [task["item"]])

    elif cmd == "list_remove":
        _list = copy.deepcopy(task["list"])
        try:
            _list.remove(task["item"])
        except ValueError:
            pass  # removing an absent item is a no-op
        set_interpdata(inserts, task["output_name"], _list)

    elif cmd == "list_index":
        _list = task["list"]
        set_interpdata(inserts, task["output_name"],
                       _list[_py_index(_list, task["index"])])

    elif cmd == "list_slice":
        _list = task["list"]
        from_index = task["from_index"]
        to_index = task["to_index"]
        from_index = eval_math(inserts, from_index) if isinstance(from_index, str) else from_index
        to_index = eval_math(inserts, to_index) if isinstance(to_index, str) else to_index
        # 1-based, right-inclusive; to < from → empty
        set_interpdata(inserts, task["output_name"],
                       _list[_py_slice_index(_list, from_index):
                             _py_slice_index(_list, to_index, right=True) + 1])

    elif cmd == "set":
        set_interpdata(inserts, task["output_name"], task["item"])

    elif cmd == "unescape":
        item = recursive_unescape(task["item"])
        item = recursive_interpolate(inserts, item)
        set_interpdata(inserts, task["output_name"], item)

    elif cmd == "random_choice":
        choice = random.choice(task["list"])
        log(f"🛈  Random choice resulted in '{str_preview(choice)}'.")
        set_interpdata(inserts, task["output_name"], choice)

    elif cmd == "delete":
        wildcards = task["wildcards"]
        for k in tuple(inserts.keys()):
            if any(is_wildcard_match(py_str(w), py_str(k)) for w in wildcards):
                log(f"🛈  delete: '{k}'")
                delete_interpdata(inserts, k)

    elif cmd == "delete_except":
        wildcards = task["wildcards"]
        for k in tuple(inserts.keys()):
            if not any(is_wildcard_match(py_str(w), py_str(k)) for w in wildcards):
                log(f"🛈  delete: '{k}'")
                delete_interpdata(inserts, k)

    elif cmd == "math":
        set_interpdata(inserts, task["output_name"],
                       eval_math(inserts, task["input"]))

    # ---- IO ------------------------------------------------------------------

    elif cmd == "print":
        # Un-escape braces for display; state['output'] keeps the same
        # unescaped text (reference: :1669-1675). Quirk preserved: the
        # reference calls .replace on the raw value *before* stringifying,
        # so print of a non-string (e.g. text:'{n}' where n is an int)
        # raises AttributeError — reproduce it rather than printing.
        text = py_str(task["text"]
                      .replace(ESCAPE + INSERT_START, INSERT_START)
                      .replace(ESCAPE + INSERT_STOP, INSERT_STOP))
        state["output"] += text
        await rt.io.write(text)

    elif cmd == "clear":
        state["output"] = ""
        await rt.io.clear()

    elif cmd == "sleep":
        seconds = task["seconds"]
        seconds = eval_math(inserts, seconds) if isinstance(seconds, str) else seconds
        await asyncio.sleep(seconds)

    elif cmd == "show_inserts":
        await rt.io.select_index(
            ["Dismiss"], description=json5.dumps(inserts, indent=4) + "\n")

    elif cmd == "user_input":
        userinput = await rt.io.user_input(prompt=task["prompt"])
        # store ESCAPED; programs opt into unescaping explicitly (:1566-1568)
        userinput = (userinput
                     .replace(INSERT_START, ESCAPE + INSERT_START)
                     .replace(INSERT_STOP, ESCAPE + INSERT_STOP))
        log(f"🛈  User entered {str_preview(userinput)}.")
        set_interpdata(inserts, task["output_name"], userinput)

    elif cmd == "user_choice":
        _list = task["list"]
        choice_index = await rt.io.select_index(
            _list, description=task["description"])
        choice = _list[choice_index]
        log(f"🛈  User selected {str_preview(choice)}.")
        set_interpdata(inserts, task["output_name"], choice)

    elif cmd == "await_insert":
        while task["name"] not in inserts:
            await asyncio.sleep(0.05)

    elif cmd == "write":
        path = os.path.expanduser(task["path"])
        resolved = path if os.path.isabs(path) else os.path.join(
            CTX.program_dir or os.getcwd(), path)
        parent = os.path.dirname(resolved) or "."
        if not os.path.isdir(parent):
            raise Exception(
                f"{task['traceback_label']}: write path '{resolved}' does not "
                f"exist.")
        if os.path.isdir(resolved):
            raise Exception(
                f"{task['traceback_label']}: write path '{resolved}' is a "
                f"directory.")
        item = recursive_unescape(task["item"])
        if isinstance(item, str):
            content = item
        elif isinstance(item, (bool, int, float)):
            content = py_str(item)
        else:
            content = json5.dumps(item, ensure_ascii=True)
        with open(resolved, "w") as f:
            f.write(content)
        log(f"🛈  write: '{resolved}' ({len(content)} bytes)")

    elif cmd == "speak":
        tts_mod.speak(task["text"], task["voice_path"],
                      task.get("voice_speaker"))

    # ---- control flow --------------------------------------------------------

    elif cmd == "label":
        pass  # jump targets are resolved by the enclosing order loop

    elif cmd == "goto":
        if task["name"] != "CONTINUE":
            return {"goto_target": task["name"]}

    elif cmd == "goto_map":
        # Interpolates lazily so a missing key can route to the NULL target.
        value_text = None
        try:
            value_text = py_str(interpolate_inserts(inserts, task["text"]))
            interp_error = False
        except InterpolationException:
            interp_error = True

        target_keys = [py_str(interpolate_inserts(inserts, next(iter(d.keys()))))
                       for d in task["target_maps"]]
        target_values = [py_str(interpolate_inserts(inserts, next(iter(d.values()))))
                         for d in task["target_maps"]]

        if interp_error:
            assert "NULL" in target_keys, (
                f"Order Index {task['traceback_label']}: value text could not be "
                f"resolved but 'NULL' is not a key in target_maps.")
            target = target_values[target_keys.index("NULL")]
            log(f"🛈  goto_map value could not be resolved ('NULL'), proceeding "
                f"to {target}")
        else:
            matching = [t for k, t in zip(target_keys, target_values)
                        if is_wildcard_match(k, value_text)]
            assert matching, (
                f"Order Index {task['traceback_label']}: goto_map has no matches "
                f"for '{value_text}'.")
            target = matching[0]  # first match wins — order is a list of dicts
            log(f"🛈  goto_map value is value_text={value_text!r}, proceeding to "
                f"{target}")

        if target != "CONTINUE":
            return {"goto_target": target}

    elif cmd == "replace_map":
        output_name = interpolate_inserts(inserts, task["output_name"])
        wildcard_maps = task["wildcard_maps"]
        repeat_until_done = task.get("repeat_until_done", False)

        def replace_str(text: str) -> str:
            last = current = text
            log(f"replace_map:\n    {str_preview(current)} \\\\ Interpolate")
            while True:
                current = py_str(interpolate_inserts(inserts, current))
                log(f"    => {str_preview(current)} \\\\ Find match")
                for d in wildcard_maps:
                    k = next(iter(d.keys()))
                    v = next(iter(d.values()))
                    k = py_str(interpolate_inserts(inserts, k))
                    if is_wildcard_match(k, current):
                        matches = get_wildcard_matches(k, current)
                        extra = {str(i + 1): cap for i, cap in enumerate(matches)}
                        log(f"        Key: {str_preview(k)}\n        "
                            f"Matches: {str_preview(matches)}")
                        current = py_str(
                            interpolate_inserts({**inserts, **extra}, v))
                        break
                log(f"    => {str_preview(current)}")
                if last == current or not repeat_until_done:
                    return current
                last = current

        def recursive_replace(x):
            insertkey = get_simple_insertkey(x)
            if insertkey:
                subkey = get_simple_insertkey(insertkey)
                if subkey:
                    return recursive_replace(
                        INSERT_START + get_interpdata(inserts, subkey) + INSERT_STOP)
                return recursive_replace(get_interpdata(inserts, insertkey))
            if isinstance(x, str):
                return replace_str(x)
            if isinstance(x, list):
                return [recursive_replace(v) for v in x]
            if isinstance(x, dict):
                return {recursive_replace(k): recursive_replace(v)
                        for k, v in x.items()}
            return x

        no_value = object()
        value_if_error = next(
            (next(iter(d.values())) for d in wildcard_maps
             if next(iter(d.keys())) == "NULL"), no_value)

        try:
            item = recursive_replace(task["item"])
        except InterpolationException as e:
            if value_if_error is no_value:
                raise AssertionError(
                    f"{task['traceback_label']}: replace_map encountered an "
                    f"interpolation error without 'NULL' key: {e!r}")
            log(f"        InterpolationError                     "
                f"Matches: {str_preview(value_if_error)}")
            set_interpdata(inserts, output_name, value_if_error)
            return None

        set_interpdata(inserts, output_name, item)

    # ---- composition ---------------------------------------------------------

    elif cmd == "run_task":
        subtask = rt.named_tasks[task["task_name"]]
        return await execute_task(
            rt, state, subtask,
            f"{runtime_label}/{subtask['traceback_label']}")

    elif cmd == "serial":
        tasks = task["tasks"]
        _ensure_traceback_labels(tasks)
        await _run_task_list(rt, state, tasks, runtime_label)

    elif cmd == "for":
        tasks = task["tasks"]
        _ensure_traceback_labels(tasks)
        lists = [recursive_interpolate(inserts, v)
                 for v in task["name_list_map"].values()]
        item_names = [recursive_interpolate(inserts, k)
                      for k in task["name_list_map"].keys()]
        lengths = [len(l) for l in lists]
        assert len(set(lengths)) == 1, (
            f"Lists have differing lengths {lengths}. Maybe zipping lists of "
            f"unequal lengths should be supported, but currently it is not in "
            f"order to catch logical errors.")

        counter_label = f"order_index/{runtime_label}/counter"
        state[counter_label] = state.get(counter_label, 1)
        while state[counter_label] <= lengths[0]:
            log(f"🛈  For loop starting iteration {state[counter_label]}")
            for item_name, _list in zip(item_names, lists):
                log(f"🛈  For loop: {item_name} set to "
                    f"{_list[state[counter_label] - 1]}")
                set_interpdata(inserts, item_name, _list[state[counter_label] - 1])
            await _run_task_list(rt, state, tasks, runtime_label)
            state[counter_label] += 1
        del state[counter_label]

    elif cmd == "parallel_wait":
        tasks = task["tasks"]
        _ensure_traceback_labels(tasks)
        await asyncio.gather(*(
            execute_task(rt, state, t,
                         f"{runtime_label}/{t['traceback_label']}")
            for t in tasks))

    elif cmd == "parallel_race":
        tasks = task["tasks"]
        _ensure_traceback_labels(tasks)
        pending = {
            asyncio.create_task(execute_task(
                rt, state, t, f"{runtime_label}/{t['traceback_label']}"))
            for t in tasks}
        try:
            done, pending = await asyncio.wait(
                pending, return_when=asyncio.FIRST_COMPLETED)
        except asyncio.CancelledError:
            for p in pending:
                p.cancel()
            await asyncio.gather(*pending, return_exceptions=True)
            raise
        for p in pending:
            p.cancel()
        # Purge raced sub-cursors so interrupted serial blocks don't resume
        # mid-way on the next entry (reference: :1621-1623, STATUS.md:95).
        for k in tuple(state.keys()):
            if k.startswith(f"order_index/{runtime_label}"):
                del state[k]
        await asyncio.gather(*pending, return_exceptions=True)
        first_task = done.pop()
        for d in done:
            d.exception()  # retrieve losers' outcomes (silences asyncio's
            #                "exception was never retrieved" GC warnings;
            #                observable behavior matches the reference)
        await first_task

    # ---- chat ------------------------------------------------------------------

    elif cmd == "chat":
        completion_args = copy.deepcopy(rt.completion_args)
        other_args = {k: v for k, v in task.items()
                      if k not in ("cmd", "messages", "output_name")}
        other_args["extra_body"] = other_args.get("extra_body", {})
        other_args["extra_body"].update(completion_args.pop("extra_body", {}))
        completion_args.update(other_args)

        start_str = completion_args.pop("start_str", "")
        stop_str = completion_args.pop("stop_str", "")
        hide_start_str = completion_args.pop("hide_start_str", "")
        hide_stop_str = completion_args.pop("hide_stop_str", "")
        n_outputs = completion_args.pop("n_outputs", 1)
        shown = completion_args.pop("shown", True)
        choices_list = completion_args.pop("choices_list", None)
        voice_path = completion_args.pop("voice_path", None)
        voice_speaker = completion_args.pop("voice_speaker", None)
        extra_body = completion_args.pop("extra_body", {})
        api_url = completion_args.pop("api_url", "http://localhost:8080")
        api_key = completion_args.pop("api_key", "unused")
        completion_args.pop("traceback_label", None)
        completion_args.pop("line", None)

        if isinstance(n_outputs, str) and n_outputs.isnumeric():
            n_outputs = int(n_outputs)
        if shown == "true":
            shown = True
        elif shown == "false":
            shown = False
        assert isinstance(shown, bool)

        # llama.cpp still expects max_tokens (reference: :2005-2006)
        if "max_completion_tokens" in completion_args:
            completion_args["max_tokens"] = completion_args.pop(
                "max_completion_tokens")

        messages = task["messages"]

        while True:
            output, visual_output = await run_chat(
                rt.io,
                messages=messages,
                completion_args=completion_args,
                start_str=start_str,
                stop_str=stop_str,
                hide_start_str=hide_start_str,
                hide_stop_str=hide_stop_str,
                n_outputs=n_outputs,
                shown=shown,
                choices_list=choices_list,
                voice_path=voice_path,
                voice_speaker=voice_speaker,
                api_url=api_url,
                api_key=api_key,
                extra_body=extra_body,
            )
            if len(output) < n_outputs:
                await rt.io.write(
                    f"\n(Expected {n_outputs} outputs, got {len(output)}. "
                    f"Retrying.)\n")
                await asyncio.sleep(2)
                continue
            if len(output) == 1:
                set_interpdata(inserts, task["output_name"], output[0])
            else:
                set_interpdata(inserts, task["output_name"], output)
            state["output"] += visual_output
            break

    else:
        raise Exception(
            f"Got unprocessable task: {task}.\nThis should have been caught "
            f"during validation and is a bug!")

    return None
