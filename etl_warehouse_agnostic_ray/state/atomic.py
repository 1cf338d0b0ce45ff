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


def atomic_write_json(path: str, obj: dict, fs=None) -> None:
    """Write-verify-rename a JSON state file.

    ``fs`` (a ``pyarrow.fs.FileSystem``) routes the write through that
    filesystem: tmp object + checksum read-back + ``fs.move``. On object
    stores move is copy+delete (not atomic) — the commit protocol
    tolerates that because readers go through the CURRENT pointer and a
    manifest is checksum-verified before the pointer references it; the
    local-FS default keeps true atomic rename + dir fsync.
    """
    if fs is not None:
        payload = json.dumps(obj, sort_keys=True, default=str).encode("utf-8")
        digest = hashlib.md5(payload).hexdigest()
        d = os.path.dirname(path)
        fs.create_dir(d, recursive=True)
        tmp = os.path.join(d, f".tmp-{os.urandom(8).hex()}.json")
        try:
            with fs.open_output_stream(tmp) as out:
                out.write(payload)
            with fs.open_input_stream(tmp) as rd:  # verify before rename
                if hashlib.md5(rd.read()).hexdigest() != digest:
                    raise IOError(f"checksum mismatch writing {path}")
            fs.move(tmp, path)
        except BaseException:
            # don't leak tmp objects on failed commits (vacuum only
            # sweeps data/, never the manifests dir)
            try:
                fs.delete_file(tmp)
            except Exception:
                pass
            raise
        return
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


def read_json(path: str, fs=None) -> dict | None:
    if fs is not None:
        from pyarrow.fs import FileType

        if fs.get_file_info(path).type == FileType.NotFound:
            return None
        with fs.open_input_stream(path) as rd:
            return json.loads(rd.read().decode("utf-8"))
    if not os.path.exists(path):
        return None
    with open(path, "rb") as fh:
        return json.loads(fh.read().decode("utf-8"))
