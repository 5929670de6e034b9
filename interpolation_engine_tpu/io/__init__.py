"""IO layer: agent-mode file protocol, buffered IO, terminal backends."""

from .manager import IOManager, AgentBackend, BufferBackend, ScriptedBackend

__all__ = ["IOManager", "AgentBackend", "BufferBackend", "ScriptedBackend"]
