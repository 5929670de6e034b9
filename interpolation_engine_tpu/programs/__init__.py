"""Program model: loading, line-number injection, static validation."""

from .loader import load, add_line_numbers
from .validator import validate_program, ValidationWarning

__all__ = ["load", "add_line_numbers", "validate_program", "ValidationWarning"]
