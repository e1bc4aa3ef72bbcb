#!/usr/bin/env python3
"""Interactive TPU-cluster parameter collection -> param_config.json.

TPU-world analog of the reference's aws_infra/multinode_batch_cdk/
config_generator.py (same prompt-with-default flow; AWS account/region/disk
become GCP project/zone/TPU type/host count).
"""

import json
import os

# v5e/v4 pod-slice host counts: 1 host drives 4 or 8 chips depending on type
TPU_TYPES = {
    "v5litepod-8": 2,
    "v5litepod-16": 4,
    "v5litepod-32": 8,
    "v5litepod-64": 16,
    "v5litepod-128": 32,
    "v5litepod-256": 64,
    "v4-8": 1,
    "v4-16": 2,
    "v4-32": 4,
}


def input_with_default(prompt: str, default_val: str) -> str:
    got = input(f"{prompt} The default is {default_val}: ").strip()
    return got or default_val


def get_parameters() -> dict:
    param = {}
    param["project"] = ""
    while not param["project"]:
        param["project"] = input("Please enter GCP project id (cannot be empty): ").strip()
    param["zone"] = input_with_default("Please enter GCP zone.", "us-central2-b")
    tpu = input_with_default(
        f"Please enter TPU type ({', '.join(sorted(TPU_TYPES))}).", "v5litepod-16"
    )
    if tpu not in TPU_TYPES:
        raise ValueError(f"unknown TPU type {tpu!r}; choose from {sorted(TPU_TYPES)}")
    param["tpu_type"] = tpu
    param["num_hosts"] = TPU_TYPES[tpu]
    param["user_name"] = input_with_default(
        "Please enter your name for tagging resources.", os.environ.get("USER", "pecos")
    )
    param["docker_image"] = input_with_default(
        "Please enter the container image (must include pecos_tpu + jax[tpu]).",
        "gcr.io/{project}/pecos-tpu:latest".format(project=param["project"]),
    )
    return param


def main():
    param = get_parameters()
    out = os.path.join(os.path.dirname(os.path.realpath(__file__)), "param_config.json")
    with open(out, "w") as fp:
        json.dump(param, fp, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
