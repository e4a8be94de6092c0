"""Export an ahead-of-time serving artifact for the eval forward.

The TPU-native replacement for the reference's compile-on-first-request
serving path (demo/predictor.py there): pre-compile the fixed-canvas eval
program once and ship the artifact next to the weights, so a serving
process skips the multi-minute XLA cold compile entirely (fmt=aot) or at
least the Python tracing + model code dependency (fmt=stablehlo).

    python -m da_detect_tpu.tools.export_serving \\
        --config-file configs/da_faster_rcnn/....yaml \\
        --output serving.pkl --format aot [--ckpt DIR] [--batch-size N]

Load side::

    from da_detect_tpu.engine.serving import load_serving
    serving = load_serving("serving.pkl")
    detections = serving(variables, image_batch)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.transforms import canvas_for
from ..engine.serving import export_serving
from ..models import build_detection_model
from ..structures.image_batch import ImageBatch
from ..utils.checkpoint import Checkpointer
from .common import base_parser, setup


def main(argv=None):
    p = base_parser("DA-Detect TPU serving export")
    p.add_argument("--output", required=True, help="artifact path (.pkl)")
    p.add_argument("--format", default="aot", choices=("aot", "stablehlo"))
    p.add_argument("--ckpt", default="", help="checkpoint dir or weight file")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--with-masks", action="store_true")
    p.add_argument("--with-keypoints", action="store_true")
    p.add_argument("--image-dtype", default="float32",
                   choices=("float32", "uint8"),
                   help="uint8 exports a raw-pixel server: clients ship 1 "
                        "byte/pixel, normalization runs inside the exported "
                        "program (engine/serving.py::batch_spec)")
    args = p.parse_args(argv)
    cfg, logger = setup(args, "da_detect_tpu.export_serving")

    model = build_detection_model(cfg)
    h, w = canvas_for(cfg, is_train=False)
    dummy = ImageBatch(
        images=jnp.zeros((1, h, w, 3), jnp.float32),
        sizes=jnp.asarray([[h, w]], jnp.int32),
        orig_sizes=jnp.asarray([[h, w]], jnp.int32),
        is_source=jnp.ones((1,), bool))
    variables = dict(model.init({"params": jax.random.PRNGKey(0)}, dummy))

    weight = args.ckpt or cfg.MODEL.WEIGHT
    ck = Checkpointer(args.ckpt or cfg.MODEL.OUTPUT_DIR, save_to_disk=False)
    if ck.has_checkpoint():
        template = {"params": jax.device_get(variables["params"]),
                    "frozen": jax.device_get(variables.get("frozen", {}))}
        state, step = ck.resume_model(template)
        variables.update(state)
        logger.info("exporting with checkpoint at iteration %d", step)
    elif weight:
        variables = Checkpointer.load_weight_file(
            weight, variables,
            pool_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION)

    import jax.numpy as jnp
    meta = export_serving(cfg, model, variables, args.output,
                          fmt=args.format, batch_size=args.batch_size,
                          with_masks=args.with_masks,
                          with_keypoints=args.with_keypoints,
                          image_dtype=jnp.dtype(args.image_dtype))
    logger.info("wrote %s: %s", args.output, meta)


if __name__ == "__main__":
    main()
