"""Static program validation — the compiler front-end's semantic checks.

Replicates the accept/reject behavior of the reference validator
(reference: interpolation_engine.py:1017-1431) and doubles as the first
stage of compilation: it attaches hierarchical ``traceback_label`` provenance
to every task (``serial-12/chat-81`` style) and proves, by whole-program
abstract interpretation, that every ``{key}`` reference *could ever* be
defined — seeding from ``default_state.inserts``, special keys, and
inserts-dir filenames, widening interpolated key segments to ``*`` wildcards,
and resolving nested keys innermost-out with an ``<Any>`` marker.

Checks the reference performs only in its Rust analyzer (e.g. warning about
``goto`` placed directly inside a ``parallel_*`` block — the Python
implementation's check is inert, see SURVEY.md §7.4) surface here as
:class:`ValidationWarning` entries rather than hard errors, preserving
load-parity with the Python reference.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from glob import glob

from ..core.context import CTX, ESCAPE, INSERT_START, INSERT_STOP
from ..core.interp import get_simple_insertkey
from ..core.wildcard import is_wildcard_match

# Delimiters used to join order items / fields into one scan string; weird
# enough that real programs never contain them (same trick as the reference).
_ORDER_ITEM_DELIM = "|。"
_TEXTS_DELIM = "|、"
_ANY_MARKER = "<〠>"

_SENT_START = ".〠"
_SENT_STOP = "〠."


@dataclass
class ValidationWarning:
    label: str
    message: str


class ProgramValidationError(AssertionError):
    pass


def _check(cond, message):
    if not cond:
        raise ProgramValidationError(message)


def validate_program(program: dict) -> list[ValidationWarning]:
    warnings: list[ValidationWarning] = []

    _check("default_state" in program,
           "Key 'default_state' not in program. Does it follow the new format?")
    _check("save_states" in program and isinstance(program["save_states"], dict),
           "program needs a 'save_states' object")
    _check("named_tasks" in program and isinstance(program["named_tasks"], dict),
           "program needs 'named_tasks' object for named tasks")
    _check("inserts" in program["default_state"]
           and isinstance(program["default_state"]["inserts"], dict),
           "default_state needs an 'inserts' object")

    # --- seed the set of keys that could ever exist -------------------------
    available = set(program["default_state"]["inserts"].keys())
    available |= {"HH:MM", "HH:MM:SS"}
    if CTX.inserts_dir:
        for path in glob(os.path.join(CTX.inserts_dir, "*")):
            filename = os.path.basename(path)
            if filename.endswith(".json5"):
                filename = filename[:-len(".json5")]
            available.add(filename)

    # --- walk every task: labels, provenance, defined/used keys -------------
    tasks_to_check = list(program["order"]) + list(program["named_tasks"].values())
    for task in tasks_to_check:
        _check("line" in task, f"This task does not have a 'line' key: {task}")
        task["traceback_label"] = f"{task['cmd']}-{task['line']}"

    unexplored = list(tasks_to_check)
    labels_seen = ["CONTINUE"]  # reserved label, always defined

    while unexplored:
        task = unexplored.pop()
        defined: set[str] = set()
        used = {key for v in task.values() if (key := get_simple_insertkey(v))}

        if "output_name" in task:
            defined.add(task["output_name"])
        if task["cmd"] == "for":
            defined |= set(task["name_list_map"].keys())
        item = task.get("item", False)
        if item and not isinstance(item, (str, list, dict)):
            # preserved quirk: the reference probes `'cmd' in item` on any
            # truthy item and TypeErrors on non-containers (e.g. int items),
            # so such programs never load (interpolation_engine.py:1058-1059)
            raise ProgramValidationError(
                f"{task['traceback_label']}: field 'item' of type "
                f"{type(item).__name__} is rejected at load (the reference "
                f"TypeErrors probing it).")
        if item and isinstance(item, (str, list)) and "cmd" in item:
            # preserved quirk: the reference's `'cmd' in item` probe also
            # fires for a *str* item containing the substring 'cmd' or a
            # *list* item containing the element 'cmd'; it then TypeErrors
            # assigning item['traceback_label'], so such programs never load
            # (interpolation_engine.py:1058-1059).
            raise ProgramValidationError(
                f"{task['traceback_label']}: field 'item' of type "
                f"{type(item).__name__} containing 'cmd' is rejected at "
                f"load (the reference TypeErrors assigning its "
                f"traceback_label).")
        if item and isinstance(item, dict) and "cmd" in item:
            item["traceback_label"] = (
                task["traceback_label"] + f"/{item['cmd']}-{item['line']}")
            unexplored.append(item)
            tasks_to_check.append(item)
        if "tasks" in task:
            subtasks = task["tasks"]
            if not get_simple_insertkey(subtasks):
                real_subtasks = [t for t in subtasks if not get_simple_insertkey(t)]
                for sub in real_subtasks:
                    sub["traceback_label"] = (
                        task["traceback_label"] + f"/{sub['cmd']}-{sub['line']}")
                unexplored.extend(real_subtasks)
                tasks_to_check.extend(real_subtasks)
        if task["cmd"] == "label":
            _check(task["name"] not in labels_seen,
                   f"{task['traceback_label']}: Label '{task['name']}' is not unique.")
            labels_seen.append(task["name"])

        # Widen interpolated segments of defined keys to '*' wildcards,
        # recording the inner keys as used (innermost-first).
        while True:
            clean = True
            for outer_key in list(defined):
                outer_from = outer_key.rfind(INSERT_START)
                inner_to = outer_key.find(INSERT_STOP, outer_from + 1)
                if outer_from == -1 or inner_to == -1:
                    continue
                clean = False
                used.add(outer_key[outer_from + 1:inner_to])
                defined.remove(outer_key)
                defined.add(outer_key[:outer_from] + "*" + outer_key[inner_to + 1:])
            if clean:
                break

        # A task like {cmd:'set', item:'{log}x', output_name:'log'} must not
        # make 'log' available by virtue of its own (undefined) use.
        available |= defined - used

    # --- whole-order scan: brace balance + key liveness ----------------------

    def to_string(val):
        if isinstance(val, str):
            return val
        if isinstance(val, (bool, int, float)):
            return str(val)
        if isinstance(val, list):
            return _TEXTS_DELIM.join(to_string(x) for x in val)
        if isinstance(val, dict):
            return _TEXTS_DELIM.join(
                to_string(k) + _TEXTS_DELIM + to_string(v) for k, v in val.items())
        raise ProgramValidationError(
            f"Encountered value {val} of type {type(val)} in to_string.")

    content = (_ORDER_ITEM_DELIM
               + _ORDER_ITEM_DELIM.join(
                   _TEXTS_DELIM.join(to_string(v) for v in item.values())
                   for item in program["order"])
               + _ORDER_ITEM_DELIM)
    content = (content
               .replace(ESCAPE + INSERT_START, _SENT_START)
               .replace(ESCAPE + INSERT_STOP, _SENT_STOP))

    for order_index, order_s in enumerate(content.split(_ORDER_ITEM_DELIM)):
        for field in order_s.split(_TEXTS_DELIM):
            _check(field.count(INSERT_START) == field.count(INSERT_STOP),
                   f"Order Index {order_index}: The following content has an "
                   f"uneven number of '{INSERT_START}' and '{INSERT_STOP}':"
                   f"\n\n\"\"\"{field}\"\"\"")

    while content.find(INSERT_START) != -1:
        outer_from = content.rfind(INSERT_START)
        inner_to = content.find(INSERT_STOP, outer_from + 1)
        order_index = content[:outer_from].count(_ORDER_ITEM_DELIM)
        _check(inner_to != -1,
               f"Order Index {order_index}: Malformed insert key, singular "
               f"'{INSERT_START}'")
        insertkey = content[outer_from + 1:inner_to]

        pattern = "*".join(re.escape(part) for part in insertkey.split(_ANY_MARKER))
        possible = any(
            is_wildcard_match(pattern, key) or is_wildcard_match(key, pattern)
            for key in available)

        current_order_item = content[
            content[:outer_from].rindex(_ORDER_ITEM_DELIM) + len(_ORDER_ITEM_DELIM):
            inner_to + 1 + content[inner_to + 1:].index(_ORDER_ITEM_DELIM)]

        # Numbered capture-group keys ({1}, {2}, …) are valid inside
        # replace_map bodies.
        if insertkey.replace(_ANY_MARKER, "").isnumeric() and \
                "replace_map" in current_order_item:
            possible = True

        if insertkey.startswith("ARG") and insertkey[3:].isdigit():
            _check(int(insertkey[3:]) > 0,
                   f"Order Index {order_index}: Argument interpolation keys must "
                   f"be greater than 0. '{insertkey}' is not valid.")
            possible = True

        pretty_key = insertkey.replace(_ANY_MARKER, "<Any>")
        _check(possible, (
            f"Order Index {order_index}: Insert key '{pretty_key}' will never be "
            f"defined for any value of <Any>."
            if _ANY_MARKER in insertkey else
            f"Order Index {order_index}: Insert key '{pretty_key}' will never be "
            f"defined."))

        content = content[:outer_from] + _ANY_MARKER + content[inner_to + 1:]

    # --- helper reused by await_insert -------------------------------------

    def is_possible_key(s: str) -> bool:
        _check(s.count(INSERT_START) == s.count(INSERT_STOP),
               f"Malformed interpolation: {s}")
        if s.count(INSERT_START) == 0:
            pattern = "(.*)".join(re.escape(part) for part in s.split(_ANY_MARKER))
            return any(re.match(pattern, key) for key in available)
        outer_from = s.rfind(INSERT_START)
        inner_to = s.find(INSERT_STOP, outer_from + 1)
        inner = s[outer_from + 1:inner_to]
        rest = s[:outer_from] + _ANY_MARKER + s[inner_to + 1:]
        return is_possible_key(inner) and is_possible_key(rest)

    # --- per-task structural checks ------------------------------------------

    def assert_types(task, field_name, legal_types):
        legal_types = list(legal_types)
        if get_simple_insertkey(task[field_name]) and str not in legal_types:
            legal_types.append(str)  # simple interpolation may resolve to anything
        t = type(task[field_name])
        _check(t in legal_types,
               f"{task['traceback_label']}: field '{field_name}' has type '{t}', "
               f"but must be one of {legal_types}.")

    # cmd → (required fields, {field: legal types}); None types = unchecked
    SIMPLE_SPECS = {
        "list_join": (("list", "before", "between", "after", "output_name"),
                      {"list": [list], "before": [str], "between": [str],
                       "after": [str], "output_name": [str]}),
        "list_concat": (("lists", "output_name"),
                        {"lists": [list], "output_name": [str]}),
        "list_append": (("list", "item", "output_name"),
                        {"list": [list], "output_name": [str]}),
        "list_remove": (("list", "item", "output_name"),
                        {"list": [list], "output_name": [str]}),
        "list_index": (("list", "index", "output_name"),
                       {"list": [list], "index": [int, str], "output_name": [str]}),
        "list_slice": (("list", "from_index", "to_index", "output_name"),
                       {"list": [list], "from_index": [int, str],
                        "to_index": [int, str], "output_name": [str]}),
        "user_choice": (("list", "output_name", "description"),
                        {"list": [list], "description": [str], "output_name": [str]}),
        "user_input": (("prompt", "output_name"),
                       {"prompt": [str], "output_name": [str]}),
        "parallel_race": (("tasks",), {"tasks": [list]}),
        "parallel_wait": (("tasks",), {"tasks": [list]}),
        "serial": (("tasks",), {"tasks": [list]}),
        "label": (("name",), {"name": [str]}),
        "set": (("item", "output_name"), {"output_name": [str]}),
        "unescape": (("item", "output_name"), {"output_name": [str]}),
        "print": (("text",), {"text": [str]}),
        "sleep": (("seconds",), {"seconds": [float, int]}),
        "clear": ((), {}),
        "show_inserts": ((), {}),
        "random_choice": (("output_name", "list"),
                          {"list": [list], "output_name": [str]}),
        "for": (("name_list_map", "tasks"),
                {"name_list_map": [dict], "tasks": [list]}),
        "replace_map": (("item", "output_name", "wildcard_maps"),
                        {"wildcard_maps": [list], "output_name": [str]}),
        "write": (("item", "path"), {"path": [str]}),
    }

    def validate_task(task):
        cmd = task.get("cmd")
        label = task.get("traceback_label", f"{cmd}-?")

        def has(*fields):
            return all(f in task for f in fields)

        if cmd in SIMPLE_SPECS and has(*SIMPLE_SPECS[cmd][0]):
            _required, types = SIMPLE_SPECS[cmd]
            for field, legal in types.items():
                assert_types(task, field, legal)
        elif cmd == "await_insert" and has("name"):
            assert_types(task, "name", [str])
            if not get_simple_insertkey(task["name"]):
                _check(is_possible_key(task["name"]),
                       f"{label}: await_insert name '{task['name']}' will never "
                       f"be defined.")
        elif cmd == "run_task" and has("task_name"):
            assert_types(task, "task_name", [str])
            _check(task["task_name"] in program["named_tasks"],
                   f"{label}: Task '{task['task_name']}' is used but never defined.")
        elif cmd == "goto" and has("name"):
            assert_types(task, "name", [str])
            target = task["name"]
            _check(target in labels_seen,
                   f"{label}: Goto is pointing at '{target}', which is not "
                   f"defined.\n\nAvailable labels: {labels_seen}")
            _warn_if_directly_parallel(task, warnings, "goto")
        elif cmd == "goto_map" and has("text", "target_maps"):
            assert_types(task, "text", [str])
            assert_types(task, "target_maps", [list])
            for entry in task["target_maps"]:
                _check(isinstance(entry, dict) and len(entry) == 1,
                       f"{label}: Elements of target_maps have to be dicts with "
                       f"one key-value-pair. The item {entry} does not match.")
            target_keys = [next(iter(d.keys())) for d in task["target_maps"]]
            target_values = [next(iter(d.values())) for d in task["target_maps"]]
            value_text = task["text"]
            no_interp = not any(INSERT_START in x for x in [value_text] + target_keys)
            no_wildcard = not any("*" in k for k in target_keys)
            if no_interp and no_wildcard:
                _check(value_text in target_keys,
                       f"{label}: value_text ({value_text}) is neither "
                       f"interpolated nor in target keys, and because there is no "
                       f"wildcard, this goto_map will fail.")
            for target in target_values:
                if INSERT_START not in target and target not in labels_seen:
                    raise ProgramValidationError(
                        f"{label}: goto_map is pointing at '{target}', which is "
                        f"not defined.")
            _warn_if_directly_parallel(task, warnings, "goto_map")
        elif cmd == "math" and has("input", "output_name"):
            assert_types(task, "input", [str])
            assert_types(task, "output_name", [str])
            _check(task["input"].count("(") == task["input"].count(")"),
                   f"{label}: Illegal parentheses in \"{task['input']}\".")
        elif cmd == "speak":
            args = {k for k in task if k != "cmd"}
            required = {"text", "voice_path"}
            permitted = {"text", "voice_path", "voice_speaker",
                         "traceback_label", "line"}
            _check(args <= permitted,
                   f"{label}: speak has illegal arguments {args - permitted}.")
            _check(args >= required,
                   f"{label}: speak is missing required arguments "
                   f"{required - args}.")
            _check(isinstance(task["text"], str), f"{label}: speak text must be str")
            _check(isinstance(task["voice_path"], str),
                   f"{label}: speak voice_path must be str")
        elif cmd == "chat":
            args = {k for k in task if k != "cmd"}
            required = {"messages", "output_name"}
            permitted = {
                "messages", "output_name", "n_outputs", "start_str", "stop_str",
                "hide_start_str", "hide_stop_str", "shown", "choices_list_name",
                "choices_list", "traceback_label", "line", "model",
                "voice_path", "voice_speaker",
                "extra_body", "max_completion_tokens", "temperature", "seed",
                "stop",
            }
            if "completion_args" not in program:
                required |= {"model"}
            _check(("start_str" in args) == ("stop_str" in args),
                   f"{label}: You can either set both start_str and stop_str or "
                   f"none. Right now you have only set one of them.")
            _check(args <= permitted,
                   f"{label}: chat has illegal arguments {args - permitted}.")
            _check(args >= required,
                   f"{label}: chat is missing required arguments "
                   f"{required - args}.")
            _check(isinstance(task["messages"], (str, list)),
                   f"{label}: messages must be str or list")
            if isinstance(task["messages"], list):
                for i, message in enumerate(task["messages"]):
                    if get_simple_insertkey(message):
                        continue
                    _check(isinstance(message, dict),
                           f"{label}: Message number {i + 1} must be an object.")
                    _check("role" in message,
                           f"{label}: Message number {i + 1} does not have 'role'.")
                    _check("content" in message,
                           f"{label}: Message number {i + 1} does not have "
                           f"'content'.")
                    _check(message["role"] in ("user", "system", "assistant"),
                           f"{label}: Message number {i + 1} has unknown role "
                           f"'{message['role']}'.")
        elif cmd == "delete" and has("wildcards"):
            assert_types(task, "wildcards", [list])
            if isinstance(task["wildcards"], list):
                for wildcard in task["wildcards"]:
                    if get_simple_insertkey(wildcard):
                        continue  # interpolated at runtime, not checkable here
                    _check(any(is_wildcard_match(wildcard, k) for k in available),
                           f"{label}: you want to delete '{wildcard}', but this "
                           f"will never be defined.")
        elif cmd == "delete_except" and has("wildcards"):
            assert_types(task, "wildcards", [list])
            if isinstance(task["wildcards"], list):
                for wildcard in task["wildcards"]:
                    _check(any(is_wildcard_match(wildcard, k) for k in available),
                           f"{label}: you want to delete '{wildcard}', but this "
                           f"will never be defined.")
        else:
            raise ProgramValidationError(f"{label}: Found unexpected task: {task}.")

    for task in tasks_to_check:
        validate_task(task)

    return warnings


def _warn_if_directly_parallel(task, warnings, cmd_name):
    """Warn when goto/goto_map sits directly inside a parallel block.

    The reference documents this as illegal but its Python check is inert
    (it inspects the task's own label segment, interpolation_engine.py:1314);
    the Rust analyzer catches it for direct children only. We accept the
    program (parity) and surface a diagnostic, like the Rust analyzer's
    diagnostics list (rust-project/src/analyzer.rs).
    """
    parts = task.get("traceback_label", "").split("/")
    if len(parts) >= 2 and parts[-2].startswith("parallel"):
        warnings.append(ValidationWarning(
            label=task["traceback_label"],
            message=f"{cmd_name} directly inside a parallel block is "
                    f"unsupported and will misbehave at runtime."))
