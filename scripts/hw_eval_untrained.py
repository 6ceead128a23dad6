"""Untrained-model recall on the hardware benchmark (the chance floor).

Step 5a of scripts/README.md: runs the full evaluation protocol with
freshly-initialized paper-scale EPC-Net weights. The resulting recall@1
(~25% at difficulty 0.5 — random projections retain some point-statistics
signal above the ~4/80 positive rate) is the floor row of BASELINE.md's
hardware recall table; trained models must clear it by tens of points.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epcnet_tpu.utils.compile_cache import enable_compilation_cache
from epcnet_tpu.configs import DataConfig, EvalConfig, ModelConfig, TrainConfig

from epcnet_tpu.data.tuples import load_pickle
from epcnet_tpu.evals.recall import evaluate_region
from epcnet_tpu.train import create_train_state
from epcnet_tpu.train.step import build_embed_fn

enable_compilation_cache()  # $EPCNET_COMPILATION_CACHE_DIR, scripts/README.md

HW = os.environ.get("EPCNET_HWBENCH", "/root/hwbench")

db_sets = load_pickle(f"{HW}/data/oxford_evaluation_database.pickle")
q_sets = load_pickle(f"{HW}/data/oxford_evaluation_query.pickle")
mcfg = ModelConfig()
dcfg = DataConfig(dataset_root=f"{HW}/data")
state = create_train_state(mcfg, TrainConfig())
embed = build_embed_fn(mcfg)
m = evaluate_region(embed, state.params, state.batch_stats, db_sets, q_sets,
                    dcfg, EvalConfig(), None)
print(f"UNTRAINED recall@1={100*m['recall_at'][0]:.2f}% "
      f"@1%={100*m['recall_at_1pct']:.2f}%", flush=True)
