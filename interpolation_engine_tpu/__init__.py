"""interpolation_engine_tpu — a TPU-native batched program VM.

A ground-up reimplementation of the capabilities of the reference
``interpolation-engine`` (a CLI runtime executing JSON5-defined resumable
state-machine programs) as a TPU-first framework:

* Host layer (this package's ``programs``/``core``/``io``/``chat`` modules):
  JSON5 parsing, static validation, an exact single-instance oracle
  interpreter, the agent-mode file protocol, chat/SSE client, persistence.
* Compiler (``compiler``): lowers a validated program to a flat, static
  instruction table + string table (labels pre-resolved to jump targets).
* Device VM (``vm`` + ``ops``): a batched interpreter — ``lax.switch`` opcode
  dispatch inside a step loop, vmapped/sharded over up to 100k+ concurrent
  program instances per chip, with inserts stored in padded uint8 byte
  arenas and interpolation as vectorized byte-scan kernels (Pallas for the
  hot loop).
* ``parallel``: jax.sharding Mesh-based data-parallel scaling of instance
  batches across chips.

Reference behavior is documented in SURVEY.md with file:line citations into
/root/reference; this code base shares no code with the reference.
"""

__version__ = "0.1.0"
