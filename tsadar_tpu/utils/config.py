"""Two-deck YAML configuration: flatten/merge/unflatten + loader.

Same semantics as the reference (``runner.py:69-72`` using ``flatten_dict``):
``defaults.yaml`` is flattened to leaf paths, updated with the flattened
``inputs.yaml`` (inputs win at leaf granularity), and unflattened back, so
reference input decks run unmodified.
"""

import os

import yaml


def flatten(d, prefix=()):
    out = {}
    for k, v in d.items():
        key = prefix + (k,)
        if isinstance(v, dict) and v:
            out.update(flatten(v, key))
        else:
            out[key] = v
    return out


def unflatten(flat):
    out = {}
    for path, v in flat.items():
        cur = out
        for k in path[:-1]:
            cur = cur.setdefault(k, {})
        cur[path[-1]] = v
    return out


def merge_configs(defaults, inputs):
    flat = flatten(defaults)
    flat.update(flatten(inputs))
    return unflatten(flat)


def load_config(cfg_dir, mode=None):
    """Load, merge, and validate ``defaults.yaml`` + ``inputs.yaml`` from a directory."""
    from .schema import validate_config

    with open(os.path.join(cfg_dir, "defaults.yaml")) as fi:
        defaults = yaml.safe_load(fi)
    with open(os.path.join(cfg_dir, "inputs.yaml")) as fi:
        inputs = yaml.safe_load(fi)
    return validate_config(merge_configs(defaults, inputs), mode=mode)


def set_forward_ranges(config):
    """Derive lamrangE/lamrangI/npts from the fit ranges (reference test_1d.py:43-51,
    calc_series.py:41-49)."""
    config["other"]["lamrangE"] = [
        config["data"]["fit_rng"]["forward_epw_start"],
        config["data"]["fit_rng"]["forward_epw_end"],
    ]
    config["other"]["lamrangI"] = [
        config["data"]["fit_rng"]["forward_iaw_start"],
        config["data"]["fit_rng"]["forward_iaw_end"],
    ]
    config["other"]["npts"] = int(
        config["other"]["CCDsize"][1] * config["other"]["points_per_pixel"]
    )
    return config
