"""NN building blocks with compression interception points."""

from pocketflow_tpu.nn.layers import (  # noqa: F401
    CompressionPolicy, compression, current_policy,
    PFConv, PFDense, PFDepthwiseConv, BatchNorm, max_pool, avg_pool, global_avg_pool,
    relu, relu6,
)
