"""Entry module for preprocessing worker subprocesses (see worker_pool.py).

Frame protocol on stdin/stdout (length-prefixed pickle):
  parent -> worker: pickled-dataset blob, then int indices until EOF
  worker -> parent: dataset[i] per index, FIFO

The real stdout fd is saved and stdout is redirected to stderr so stray
prints from dataset code can't corrupt the frame stream.
"""

import os
import pickle
import sys
import traceback


def main() -> None:
    from roitr_tpu.data.worker_pool import read_frame, write_frame

    in_fd = sys.stdin.fileno()
    out_fd = os.dup(sys.stdout.fileno())
    os.dup2(sys.stderr.fileno(), sys.stdout.fileno())

    blob = read_frame(in_fd)
    if blob is None:
        return
    dataset = pickle.loads(blob)
    while True:
        idx = read_frame(in_fd)
        if idx is None:
            return
        try:
            item = dataset[int(idx)]
        except Exception:
            item = {"__worker_error__": True, "traceback": traceback.format_exc()}
        write_frame(out_fd, item)


if __name__ == "__main__":
    main()
