"""Offline checkpoint preprocessor CLI.

Capability parity with the reference's preprocessor
(reference: script/preprocess_and_save.py + skip_preprocess=True,
docs/Development.md:139-172): run the full load pipeline once (format
adapters, name remaps, structural merges, quantization, storage
requantize/packing) and dump the transformed tree, so production startup
is a straight load.

Usage:
    python scripts/preprocess_and_save.py models=Llama-3-8B-Instruct \
        models.ckpt_dir=/ckpt infer.do_load=true quant.method=soft_fp8 \
        quant.quant_on_load=true
    # then serve with skip_preprocess=true for fast startup
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from chitu_tpu.config import load_config
from chitu_tpu.engine import Engine
from chitu_tpu.loader import save_preprocessed
from chitu_tpu.utils import get_logger

logger = get_logger()


def main():
    cfg = load_config(overrides=sys.argv[1:])
    t0 = time.time()
    engine = Engine(cfg)
    out = os.path.join(
        cfg.models.ckpt_dir or ".", "chitu_tpu_preprocessed"
    )
    save_preprocessed(
        engine.params, out,
        layout={"merge_tp": getattr(engine.model, "merge_tp", 1)},
    )
    logger.info(
        "preprocessed checkpoint saved to %s in %.1fs "
        "(serve with skip_preprocess=true)",
        out,
        time.time() - t0,
    )


if __name__ == "__main__":
    main()
