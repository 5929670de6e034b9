"""Batched device VM: compiled programs stepped under jit/vmap on TPU."""
