#!/usr/bin/env python3
"""Generate + (dry-run) submit a multi-host TPU training job.

TPU-world analog of the reference's aws_infra submit_job.py (boto3 AWS Batch
multi-node job, /root/reference/aws_infra/multinode_batch_cdk/submit_job.py):
emits a JobSet-on-GKE manifest — one worker per TPU VM host, each running the
distributed xlinear train CLI — plus the kubectl/gcloud commands to launch
it. Always dry-run in this environment (no cloud credentials); the manifest
is standard and can be applied unmodified on a real cluster.
"""

import argparse
import json
import os

MANIFEST = """\
apiVersion: jobset.x-k8s.io/v1alpha2
kind: JobSet
metadata:
  name: {job_name}
  labels:
    app: pecos-tpu
    user: {user_name}
spec:
  replicatedJobs:
    - name: workers
      replicas: 1
      template:
        spec:
          parallelism: {num_hosts}
          completions: {num_hosts}
          backoffLimit: 0
          template:
            spec:
              restartPolicy: Never
              nodeSelector:
                cloud.google.com/gke-tpu-accelerator: tpu-{tpu_family}-slice
                cloud.google.com/gke-tpu-topology: "{topology}"
              containers:
                - name: pecos-tpu
                  image: {docker_image}
                  command:
                    - python
                    - -m
                    - pecos_tpu.distributed.xmc.xlinear.train
                    - -x
                    - {input_gcs}/X.trn.npz
                    - -y
                    - {input_gcs}/Y.trn.npz
                    - -m
                    - {output_gcs}/model
                    - --dist-backend
                    - multihost
                  resources:
                    requests:
                      google.com/tpu: "{chips_per_host}"
                    limits:
                      google.com/tpu: "{chips_per_host}"
"""

TOPOLOGY = {  # tpu_type -> (family, topology, chips per host)
    "v5litepod-8": ("v5lite-podslice", "2x4", 4),
    "v5litepod-16": ("v5lite-podslice", "4x4", 4),
    "v5litepod-32": ("v5lite-podslice", "4x8", 4),
    "v5litepod-64": ("v5lite-podslice", "8x8", 4),
    "v5litepod-128": ("v5lite-podslice", "8x16", 4),
    "v5litepod-256": ("v5lite-podslice", "16x16", 4),
    "v4-8": ("v4-podslice", "2x2x1", 4),
    "v4-16": ("v4-podslice", "2x2x2", 4),
    "v4-32": ("v4-podslice", "2x2x4", 4),
}


def main():
    ap = argparse.ArgumentParser()
    default_cfg = os.path.join(
        os.path.dirname(os.path.realpath(__file__)), "param_config.json"
    )
    ap.add_argument("--config", default=default_cfg, help="param_config.json path")
    ap.add_argument("--job-name", required=True)
    ap.add_argument("--input-gcs", required=True, help="gs:// input folder")
    ap.add_argument("--output-gcs", required=True, help="gs:// output folder")
    ap.add_argument(
        "--emit", choices=["yaml", "commands"], default="commands",
        help="print the JobSet manifest or the submit command sequence",
    )
    args = ap.parse_args()

    with open(args.config) as f:
        cfg = json.load(f)
    family, topology, chips = TOPOLOGY[cfg["tpu_type"]]
    manifest = MANIFEST.format(
        job_name=args.job_name,
        user_name=cfg["user_name"],
        num_hosts=cfg["num_hosts"],
        tpu_family=family,
        topology=topology,
        chips_per_host=chips,
        docker_image=cfg["docker_image"],
        input_gcs=args.input_gcs.rstrip("/"),
        output_gcs=args.output_gcs.rstrip("/"),
    )
    if args.emit == "yaml":
        print(manifest)
        return
    path = f"/tmp/{args.job_name}.jobset.yaml"
    with open(path, "w") as f:
        f.write(manifest)
    print(f"# DRY RUN (no cluster credentials in this environment); wrote {path}")
    print(f"gcloud container clusters get-credentials <cluster> --zone {cfg['zone']} "
          f"--project {cfg['project']}")
    print(f"kubectl apply -f {path}")
    print(f"kubectl logs -f jobset/{args.job_name} -c pecos-tpu")


if __name__ == "__main__":
    main()
