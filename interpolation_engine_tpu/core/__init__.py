"""Host-side exact core: interpolation, math, wildcards, filters, executor.

This is both the "compiler front-end" for the device VM and the oracle the
batched TPU path is differential-tested against (SURVEY.md §7.2 PR1).
"""
