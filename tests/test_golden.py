"""Golden-descriptor regression (SURVEY.md §4 implication (d)).

A fixed-seed model + fixed input must keep producing the same descriptors
across refactors. The golden file is committed; regenerate DELIBERATELY with
  python tests/test_golden.py regen
after an intentional numerics change, and say why in the commit.

NOT THE PARITY CONTRACT: these fixtures pin OUR OWN past outputs
(self-referential regression only). Green-golden says "nothing drifted
since the pin", not "matches the reference implementation" — reference
parity requires real reference weights through utils/importer.py
(golden-descriptor protocol of SURVEY.md §7.4, blocked on the empty
reference mount; see VERDICT r2 weak #6).
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_descriptors.npz")


def _compute():
    from epcnet_tpu.configs import ModelConfig, epcnet_l_config, pointnetvlad_config
    from epcnet_tpu.models import get_model

    rng = np.random.RandomState(12345)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 128, 3)).astype(np.float32))
    out = {}
    for name, cfg in [
        ("epcnet", ModelConfig(num_points=128, knn_k=8, use_pallas=False,
                               proxyconv_channels=(16, 16), lift_channels=(32, 64),
                               feature_dim=64, vlad_clusters=8, vlad_groups=4,
                               vlad_group_dim=16)),
        ("epcnet_l", epcnet_l_config(num_points=128, knn_k=8, use_pallas=False,
                                     proxyconv_channels=(8, 8), lift_channels=(16, 32),
                                     feature_dim=32, vlad_clusters=4, vlad_groups=2,
                                     vlad_group_dim=8)),
        ("pointnetvlad", pointnetvlad_config(num_points=128, use_pallas=False,
                                             vlad_clusters=8, feature_dim=64,
                                             pointnet_channels=(16, 16, 16, 32, 64),
                                             vlad_group_dim=256)),
    ]:
        model = get_model(cfg)
        v = model.init(jax.random.PRNGKey(7), x, train=False)
        out[name] = np.asarray(model.apply(v, x, train=False))
    return out


def test_golden_descriptors():
    assert os.path.isfile(GOLDEN), "golden file missing — run: python tests/test_golden.py regen"
    golden = np.load(GOLDEN)
    got = _compute()
    for name in golden.files:
        np.testing.assert_allclose(
            got[name], golden[name], atol=2e-5,
            err_msg=f"{name} descriptors drifted from golden — if intentional, "
                    f"regenerate via 'python tests/test_golden.py regen'",
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        jax.config.update("jax_platforms", "cpu")
        np.savez(GOLDEN, **_compute())
        print(f"wrote {GOLDEN}")
    else:
        print(__doc__)
