"""Atomic, verified JSON writes.

Matches the reference's state-file discipline — write tmp, fsync,
checksum-verify, rename (``extractors/repsly/extractor.py:432-481``) —
reimplemented from the pattern, not copied.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile


def fsync_dir(path: str) -> None:
    """fsync a DIRECTORY so a completed rename inside it survives power
    loss (a renamed entry is only durable once its directory's metadata
    is flushed). No-op on platforms/filesystems without O_DIRECTORY
    semantics."""
    try:
        fd = os.open(path, os.O_RDONLY | getattr(os, "O_DIRECTORY", 0))
    except OSError:
        return
    try:
        os.fsync(fd)
    except OSError:
        pass
    finally:
        os.close(fd)


def atomic_write_json(path: str, obj: dict) -> None:
    payload = json.dumps(obj, sort_keys=True, default=str).encode("utf-8")
    digest = hashlib.md5(payload).hexdigest()
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp-", suffix=".json")
    try:
        with os.fdopen(fd, "wb") as fh:
            fh.write(payload)
            fh.flush()
            os.fsync(fh.fileno())
        with open(tmp, "rb") as fh:  # verify before rename
            if hashlib.md5(fh.read()).hexdigest() != digest:
                raise IOError(f"checksum mismatch writing {path}")
        os.replace(tmp, path)
        fsync_dir(d)  # make the rename itself durable, not just the bytes
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def read_json(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    with open(path, "rb") as fh:
        return json.loads(fh.read().decode("utf-8"))
