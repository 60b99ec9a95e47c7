"""CLI: convert a reference torch checkpoint into an orbax params checkpoint.

Usage: python tools/convert_weights.py model_3dmatch.pth out_dir/
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("torch_ckpt")
    parser.add_argument("out_dir")
    parser.add_argument("--arch", nargs="*", default=["self", "cross"] * 3)
    args = parser.parse_args()

    import numpy as np
    import orbax.checkpoint as ocp

    from roitr_tpu.utils.convert import load_torch_checkpoint, torch_state_dict_to_params

    sd = load_torch_checkpoint(args.torch_ckpt)
    params = torch_state_dict_to_params(sd, transformer_architecture=tuple(args.arch))
    n = sum(int(np.prod(np.shape(x))) for x in
            __import__("jax").tree_util.tree_leaves(params))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.out_dir), {"params": params}, force=True)
    ckptr.wait_until_finished()
    print(f"converted {n:,} params -> {args.out_dir}")


if __name__ == "__main__":
    main()
