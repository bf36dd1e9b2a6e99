"""Pallas TPU kernels: in-row lane gathers for the block-hash encoder."""

from indoor_nerf_tpu.ops.pallas.lane_gather import lane_select
