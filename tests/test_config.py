"""Config system (SURVEY.md §5.6): presets + dotted overrides + coercion."""

import pytest

from composable_diffusion_models_tpu.utils.config import get_config, to_dict


def test_preset_with_dotted_overrides():
    cfg = get_config("mnist_image", ["--train.steps=7", "--model.base_dim=8"])
    assert cfg.train.steps == 7
    assert cfg.model.base_dim == 8
    assert isinstance(to_dict(cfg), dict)


def test_tuple_override_json_and_python_spellings():
    # JSON spelling
    cfg = get_config("shapes_ddim", ["--data.holdout=[[2,2],[0,1]]"])
    assert cfg.data.holdout == ((2, 2), (0, 1))
    # Python tuple spelling, including the trailing comma of a 1-tuple —
    # the natural copy-paste of the preset's own default ((2, 2),)
    cfg = get_config("shapes_ddim", ["--data.holdout=((2,2),)"])
    assert cfg.data.holdout == ((2, 2),)


def test_tuple_override_garbage_names_value():
    with pytest.raises(ValueError, match="could not parse"):
        get_config("shapes_ddim", ["--data.holdout=[[2,"])
