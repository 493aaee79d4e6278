"""mds_tpu — TPU-native multi-dataset semantic segmentation framework.

A from-scratch JAX/Flax/Pallas/pjit rebuild of the capabilities of the
reference PyTorch harness Mrhonor/Mul-Datasets-Semantic-Segmentation
(see SURVEY.md): BiSeNetV1/V2, SwiftNet-pyramid and HRNet-W48 backbones,
joint training over up to 7 datasets with per-dataset batch norms and heads,
OHEM/contrast/RMI losses, GNN label-space unification with unbalanced-Sinkhorn
bipartite matching, multi-scale/flip/crop mIoU evaluation, and an exported-graph
deployment path.

Package layout:
  mds_tpu.config      — JSON config system (Configer equivalent, tools/configer.py)
  mds_tpu.registry    — model/dataset/loss registries (lib/models/__init__.py)
  mds_tpu.models      — Flax model zoo (lib/models/)
  mds_tpu.ops         — numerical ops: OHEM top-k, Sinkhorn/UOT, resize, Pallas kernels
  mds_tpu.losses      — loss zoo (lib/loss/)
  mds_tpu.data        — host-side input pipeline (lib/*_cv2.py, get_dataloader.py)
  mds_tpu.parallel    — mesh/sharding utilities (DDP/NCCL equivalents)
  mds_tpu.engine      — trainer stage machine, optimizers, checkpoints (tools/train_*.py)
  mds_tpu.evaluation  — mIoU evaluators (evaluate.py)
  mds_tpu.deploy      — jax.export / serving (tensorrt/, ncnn/, openvino/, tis/)
"""

__version__ = "0.1.0"
