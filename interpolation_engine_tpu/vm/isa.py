"""Instruction set of the batched device VM.

A compiled program is a flat int32 instruction table plus a string table and
an auxiliary operand pool (SURVEY.md §7.1(1)): one row per instruction,
``[opcode, a, b, c]`` where most operands live in ``aux`` spans. Labels are
compiled away (jumps are static pc targets); ``serial``/``for`` bodies are
inlined with loop-counter slots; ``run_task`` is inlined per call site;
blocking or host-only tasks lower to OP_PARK and are serviced by the host IO
ring, which executes the *original* task against the decoded instance state
with the exact host executor — the universal fallback that keeps the device
path semantically total.

Value specs (vspec, 3 ints) describe task operands:
  (VK_STR,  strtab_off, len)   — a template string, interpolated at runtime
  (VK_INT,  value,      0)     — int literal
  (VK_LIST, aux_idx,    count) — list literal; elements are nested vspecs
  (VK_HOST, 0,          0)     — value shape the device defers to host
"""

OP_HALT = 0
OP_PRINT = 1
OP_SET = 2
OP_UNESCAPE = 3
OP_GOTO = 4
OP_GOTO_MAP = 5
OP_MATH = 6
OP_LIST_JOIN = 7
OP_LIST_CONCAT = 8
OP_LIST_APPEND = 9
OP_LIST_REMOVE = 10
OP_LIST_INDEX = 11
OP_LIST_SLICE = 12
OP_REPLACE_MAP = 13
OP_DELETE = 14
OP_DELETE_EXCEPT = 15
OP_CLEAR = 16
OP_SLEEP = 17
OP_RANDOM_CHOICE = 18
OP_FOR_HEAD = 19
OP_FOR_NEXT = 20
OP_PARK = 21
OP_NOP = 22
OP_MATH_RPN = 23      # statically-compiled math expression (RPN over int32)
OP_GOTO_MAP_LIT = 24  # goto_map whose keys and targets are all literal
OP_PRINT_LIT = 25     # print of a literal (brace-free) text
OP_SET_LN = 26        # set with a literal output name
OP_MATH_RPN_LN = 27   # math RPN with a literal output name
OP_PAR_BEGIN = 28     # spawn parallel_wait/race thread lanes (aux record)
OP_THREAD_END = 29    # current thread's subtask body completed

N_OPS = 30

OP_NAMES = {
    v: k[3:].lower() for k, v in list(globals().items())
    if k.startswith("OP_") and isinstance(v, int)
}

# vspec kinds
VK_STR = 0
VK_INT = 1
VK_LIST = 2
VK_HOST = 3

# goto_map entry target markers
TARGET_DYNAMIC = -1

# RPN entry kinds (OP_MATH_RPN; 3 ints each: kind, x, y)
RPN_CONST = 0      # push x
RPN_HOLE = 1       # interpolate template (x=off, y=len) → must be an int
RPN_LENGTH = 2     # push len(list at key (x=off, y=len))
RPN_MINLIST = 3    # push min(int list at key)
RPN_MAXLIST = 4    # push max(int list at key)
RPN_ADD = 5
RPN_SUB = 6
RPN_MUL = 7
RPN_DIV = 8        # exact division only (else host fallback)
RPN_MOD = 9
RPN_NEG = 10
RPN_MIN2 = 11      # binary min (enumeration folding)
RPN_MAX2 = 12
RPN_SIGN = 13
