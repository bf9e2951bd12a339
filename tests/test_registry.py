"""Registry presets: every family constructible and sized plausibly."""

import pytest

from mistral_inference_tpu.args import MambaArgs, TransformerArgs
from mistral_inference_tpu.models.registry import REGISTRY, get_args, param_count

EXPECTED_B = {
    "mistral-7b-v0.3": (6.5e9, 8.5e9),
    "mistral-nemo-12b": (11e9, 14e9),
    "codestral-22b": (20e9, 24e9),
    "mixtral-8x7b": (44e9, 50e9),
    "mistral-large-2-123b": (118e9, 128e9),
    "codestral-mamba-7b": (6e9, 8.5e9),
}


def test_all_construct():
    for name in REGISTRY:
        args = get_args(name)
        assert isinstance(args, (TransformerArgs, MambaArgs))


@pytest.mark.parametrize("name,bounds", EXPECTED_B.items())
def test_param_counts(name, bounds):
    lo, hi = bounds
    assert lo <= param_count(name) <= hi, param_count(name)


def test_pixtral_has_vision():
    assert get_args("pixtral-12b").vision_encoder is not None


def test_get_args_is_copy():
    a = get_args("mistral-7b-v0.3")
    a.max_batch_size = 99
    assert get_args("mistral-7b-v0.3").max_batch_size != 99
