"""Run/event id generation.

Reference analogue: Circus Train names every replication run with a unique
event id (``ctp-20160322T061345.487Z-YtMhVotF``) that keys destination
folders, snapshots and lineage — ``circus-train-core/src/main/java/com/hotels/
bdp/circustrain/core/EventIdFactory.java:37-58``. We keep the same shape:
``cts-<utc timestamp>-<random token>``.
"""

from __future__ import annotations

import random
import string
from datetime import datetime, timezone

_PREFIX = "cts"
_TOKEN_LEN = 8
_ALPHABET = string.ascii_letters + string.digits


def new_event_id(prefix: str = _PREFIX, seed: int | None = None) -> str:
    rng = random.Random(seed)
    ts = datetime.now(timezone.utc).strftime("%Y%m%dT%H%M%S.%f")[:-3]
    token = "".join(rng.choice(_ALPHABET) for _ in range(_TOKEN_LEN))
    return f"{prefix}-{ts}Z-{token}"
