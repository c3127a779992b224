"""Reference config-file compatibility: every shipped hparam JSON loads.

Runs only when the reference checkout is present (config files are data, not
code); skipped otherwise so the suite is standalone.
"""
import json
import os
import pathlib

import pytest

REF = pathlib.Path("/root/reference/config/models_config")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference checkout not present")


def all_config_files():
    return sorted(REF.rglob("*.json"))


def test_all_reference_configs_load():
    from aspire_tpu.core.config import RunConfig
    from aspire_tpu.models.doc_models import MODEL_REGISTRY, _sent_models
    files = all_config_files()
    assert len(files) > 30, f"expected the config forest, found {len(files)}"
    known = set(MODEL_REGISTRY) | set(_sent_models())
    unknown_models = set()
    for f in files:
        rc = RunConfig.from_json(f)
        assert rc.train.batch_size > 0
        assert rc.model.model_name, f
        if rc.model.model_name not in known:
            unknown_models.add(rc.model.model_name)
        # OT configs must carry solver params in the model hparams
        if rc.model.score_aggregation == "l2wasserstein":
            assert rc.model.geoml_blur > 0
    # every model named by any shipped config must exist in our registry
    assert not unknown_models, unknown_models


def test_reference_best_config_values():
    """Spot-check the headline otAspire config round-trips exactly."""
    from aspire_tpu.core.config import RunConfig
    f = REF / "s2orccompsci" / "hparam_opt" / "miswordbienc-otstuni-best.json"
    rc = RunConfig.from_json(f)
    assert rc.model.model_name == "miswordbienc"
    assert rc.model.score_aggregation == "l2wasserstein"
    assert rc.model.sent_sm_temp == 5000.0
    assert rc.model.geoml_blur == 0.05 and rc.model.geoml_scaling == 0.9
    assert rc.train.batch_size == 3 and rc.train.accumulated_batch_size == 30
    assert rc.train.es_check_every == 10000
    info = rc.to_flat_dict()
    assert info["base-pt-layer"] == "allenai/specter"
