"""Compiler: validated program → flat device instruction table."""

from .lower import CompiledProgram, compile_program, CompileError

__all__ = ["CompiledProgram", "compile_program", "CompileError"]
