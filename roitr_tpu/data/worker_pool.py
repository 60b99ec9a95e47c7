"""Dedicated preprocessing worker pool (subprocess + pipe protocol).

Why not multiprocessing.Pool: every start method is wrong for a JAX host
process. `fork` risks deadlocking children on locks held by XLA's threads
(jax emits a RuntimeWarning saying exactly that); `spawn` and `forkserver`
both re-execute the caller's __main__ module in every child (spawn.py
_fixup_main_from_path) — which breaks REPL/stdin callers outright (infinite
respawn of '<stdin>') and re-imports the caller's full jax stack per
worker.

Instead each worker is a plain `python -m roitr_tpu.data.worker_main`
subprocess: a clean interpreter that never sees the caller's __main__ and
imports only what unpickling the dataset needs (numpy/scipy/native C++).
The protocol is length-prefixed pickle frames: the parent sends the dataset
once, then index frames; the worker replies with item frames in FIFO
order. Ordered fan-out = round-robin dispatch + in-order round-robin reads
(each worker is FIFO, so global order is preserved). OS pipe buffers give
natural backpressure.

This is the TPU-native equivalent of the reference's torch DataLoader
worker processes (reference main.py:113-127, num_workers=8).
"""

from __future__ import annotations

import os
import pickle
import struct
import subprocess
import sys
from typing import Iterable, Iterator, Sequence

_HDR = struct.Struct("<Q")


def write_frame(fd, obj) -> None:
    payload = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    os.write(fd, _HDR.pack(len(payload)))
    # os.write may be partial for large payloads on pipes
    view = memoryview(payload)
    while view:
        n = os.write(fd, view)
        view = view[n:]


def read_frame(fd):
    hdr = _read_exact(fd, _HDR.size)
    if hdr is None:
        return None
    (length,) = _HDR.unpack(hdr)
    payload = _read_exact(fd, length)
    if payload is None:
        raise EOFError("worker pipe closed mid-frame")
    return pickle.loads(payload)


def _read_exact(fd, n: int):
    """n bytes from fd; None on clean EOF at a frame boundary."""
    chunks = []
    got = 0
    while got < n:
        chunk = os.read(fd, n - got)
        if not chunk:
            if not chunks:
                return None
            raise EOFError("pipe closed mid-frame")
        chunks.append(chunk)
        got += len(chunk)
    return b"".join(chunks)


class WorkerPool:
    """Ordered parallel map of dataset[i] over worker subprocesses."""

    def __init__(self, dataset, num_workers: int):
        self.num_workers = num_workers
        self.procs = []
        env = dict(os.environ)
        # workers never touch a device; make accidental jax use cheap + safe
        env["JAX_PLATFORMS"] = "cpu"
        # the parent's full sys.path (site-packages, the repo, test dirs for
        # datasets defined there) must be visible BEFORE -m resolves, since
        # -S skips site initialization; PYTHONPATH is read at startup
        env["PYTHONPATH"] = os.pathsep.join(p for p in sys.path if p)
        for _ in range(num_workers):
            # -S skips site initialization: the environment's sitecustomize
            # imports the full jax stack into every interpreter (~2 s per
            # worker, serialized on small hosts); workers don't need it —
            # the parent's sys.path (incl. site-packages) is inherited via
            # ROITR_WORKER_SYSPATH
            p = subprocess.Popen(
                [sys.executable, "-S", "-m", "roitr_tpu.data.worker_main"],
                stdin=subprocess.PIPE,
                stdout=subprocess.PIPE,
                env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            )
            self.procs.append(p)
        blob = pickle.dumps(dataset, protocol=pickle.HIGHEST_PROTOCOL)
        for p in self.procs:
            write_frame(p.stdin.fileno(), blob)

    def imap(self, indices: Sequence[int]) -> Iterator:
        """Yield dataset[i] for i in indices, in order."""
        indices = list(indices)
        sent = 0
        # prime each worker with a small FIFO backlog, then send one new
        # index per received item (bounds worker-side memory)
        depth = 4
        for sent in range(min(len(indices), self.num_workers * depth)):
            w = self.procs[sent % self.num_workers]
            write_frame(w.stdin.fileno(), int(indices[sent]))
        sent = min(len(indices), self.num_workers * depth)
        for i in range(len(indices)):
            w = self.procs[i % self.num_workers]
            item = read_frame(w.stdout.fileno())
            if item is None:
                raise RuntimeError(
                    f"preprocessing worker {i % self.num_workers} died "
                    f"(exit {w.poll()}); see its stderr above"
                )
            if isinstance(item, dict) and item.get("__worker_error__"):
                raise RuntimeError(f"preprocessing worker raised:\n{item['traceback']}")
            if sent < len(indices):
                nxt = self.procs[sent % self.num_workers]
                write_frame(nxt.stdin.fileno(), int(indices[sent]))
                sent += 1
            yield item

    def close(self) -> None:
        for p in self.procs:
            try:
                p.stdin.close()
            except Exception:
                pass
        for p in self.procs:
            try:
                p.wait(timeout=5)
            except Exception:
                p.kill()
        self.procs = []

    def __del__(self):
        self.close()
