"""Load the reference implementation as a differential-testing oracle.

The reference at /root/reference imports third-party modules absent from this
environment (json5, openai); we install minimal shims (json5 backed by our
own parser — itself independently unit-tested) so the reference's *pure*
functions (validator, interpolation, math, filters) can be called and
compared against ours. Reference code is exercised, never copied.
"""

import sys
import types

_ref = None


def get_reference():
    global _ref
    if _ref is not None:
        return _ref

    from interpolation_engine_tpu import json5 as myjson5

    if "json5" not in sys.modules:
        m = types.ModuleType("json5")
        m.loads = myjson5.loads

        def dumps(obj, indent=None, quote_keys=True, ensure_ascii=True, **kw):
            return myjson5.dumps(obj, indent=indent, ensure_ascii=ensure_ascii)

        m.dumps = dumps
        sys.modules["json5"] = m

    if "openai" not in sys.modules:
        oa = types.ModuleType("openai")

        class AsyncOpenAI:  # never used in the pure functions we exercise
            def __init__(self, **kw):
                pass

        oa.AsyncOpenAI = AsyncOpenAI
        sys.modules["openai"] = oa

    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")

    import interpolation_engine.interpolation_engine as ref  # noqa: E402
    import interpolation_engine.filter as ref_filter  # noqa: E402

    # the reference only defines log_sink inside main(); its pure functions
    # print traces to it unconditionally
    import os
    ref.log_sink = open(os.devnull, "w")

    _ref = types.SimpleNamespace(engine=ref, filter=ref_filter)
    return _ref
