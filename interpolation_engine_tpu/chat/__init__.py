"""Chat service: OpenAI-compatible streaming client + orchestration."""

from .client import ChatClient, ChatError, OutOfContextError
from .service import run_chat

__all__ = ["ChatClient", "ChatError", "OutOfContextError", "run_chat"]
