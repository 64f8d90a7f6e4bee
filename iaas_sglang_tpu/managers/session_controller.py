"""Multi-turn session control (analog of sglang
srt/managers/session_controller.py:21 Session/SessionReqNode).

A session accumulates the token history of its turns; a generate request
carrying `session_id` is automatically prefixed with that history, and
the radix cache turns the shared prefix into a KV hit. Branching from an
earlier turn works by truncating with `rid_of_parent` (kept simple: the
linear history of the reference's common path)."""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class Session:
    session_id: str
    history_tokens: List[int] = field(default_factory=list)
    turns: List[str] = field(default_factory=list)  # rids in order

    def compose_input(self, new_tokens: List[int]) -> List[int]:
        return self.history_tokens + list(new_tokens)

    def commit_turn(self, rid: str, input_tokens: List[int],
                    output_tokens: List[int]) -> None:
        self.history_tokens = list(input_tokens) + list(output_tokens)
        self.turns.append(rid)


class SessionController:
    def __init__(self):
        self.sessions: Dict[str, Session] = {}

    def open(self, session_id: Optional[str] = None) -> str:
        sid = session_id or uuid.uuid4().hex
        self.sessions[sid] = Session(session_id=sid)
        return sid

    def close(self, session_id: str) -> None:
        self.sessions.pop(session_id, None)

    def get(self, session_id: str) -> Optional[Session]:
        return self.sessions.get(session_id)
