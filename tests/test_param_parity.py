"""Parameter-count parity with the reference's published numbers
(final_report/chapters/Experiments.tex:20-24, BASELINE.md): torch's
`model.parameters()` excludes FrozenBatchNorm tensors (torchvision registers
them as buffers), so the comparison subtracts our FrozenBatchNorm leaves —
after which the counts must match EXACTLY for every pathway config."""
import jax
import numpy as np
import pytest

from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables

REFERENCE_COUNTS = {
    (1, 1): 45_421_851,
    (3, 3): 46_398_747,
    (7, 7): 48_407_835,
    (1, 7): 45_618_459,
    (3, 7): 46_570_779,
}


def count_params_excluding_frozen_bn(params):
    total = 0
    frozen_bn = 0

    def walk(node, in_bn):
        nonlocal total, frozen_bn
        if isinstance(node, dict):
            for k, v in node.items():
                is_bn = in_bn or "bn" in k.split("_")[-1] or k.startswith("bn")
                walk(v, is_bn and not k.endswith("_conv"))
        else:
            n = int(np.prod(node.shape))
            total += n
            if in_bn:
                frozen_bn += n

    # FrozenBatchNorm lives only under backbone (body + nothing else);
    # SlowFast BN scale/bias DO count in torch (nn.BatchNorm3d parameters).
    walk(params["backbone"], False)
    bb_total, bb_bn = total, frozen_bn
    total, frozen_bn = 0, 0
    for k in params:
        if k != "backbone":
            walk(params[k], False)
    rest = total
    return bb_total - bb_bn + rest


@pytest.mark.parametrize("slow,fast", list(REFERENCE_COUNTS))
def test_param_count_matches_reference(slow, fast):
    # s2d_stem=False: the space-to-depth stem re-parameterizes conv1 with
    # padded taps (192 vs 49) while computing the identical function; strict
    # count parity holds for the torchvision-layout stem.
    pipe, model = build_pipeline(
        slow=slow, fast=fast, original_hw=(60, 100), min_size=64, max_size=128,
        s2d_stem=False,
    )
    variables = init_variables(model, jax.random.PRNGKey(0))
    n = count_params_excluding_frozen_bn(variables["params"])
    assert n == REFERENCE_COUNTS[(slow, fast)], (
        f"{slow}-{fast}: {n:,} != reference {REFERENCE_COUNTS[(slow, fast)]:,}"
    )
