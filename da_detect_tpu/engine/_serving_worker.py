"""Pristine-process AOT compile+serialize worker for ``engine.serving``.

XLA:CPU cannot faithfully serialize an executable that was compiled in a
process with *prior* compilations: the serialized thunks reference
name-uniquified auxiliary fusion functions (e.g. ``convert_convert_fusion.54``
— the ``.54`` suffix comes from the process-wide uniquifier) that are not
resolvable when the artifact is deserialized, failing at first run with
``NOT_FOUND: Buffer Definition Event: Function ... not found``. Bisected
round 3: a clean-process export loads and runs everywhere (including in
processes full of prior compilations); a dirty-process export runs nowhere,
even in a pristine loader. So the export itself must happen in a process
that has never compiled anything else.

``export_serving`` therefore lowers/exports the traced program (StableHLO,
capturing the exporting process's numerics config) and ships it here; this
fresh process compiles it — persistent cache off, so the compile is genuinely
new — and returns the serialized executable. Invoked as::

    python -m da_detect_tpu.engine._serving_worker <request.pkl> <reply.pkl>

The request/reply pickles are private to ``export_serving`` (same trust
domain: both ends are the exporting user's own process tree).
"""

from __future__ import annotations

import os
import pickle
import sys


def compile_and_serialize(exp_bytes: bytes):
    """Compile a serialized ``jax.export`` artifact for this process's
    devices (fully replicated inputs) and serialize the executable.

    Shared by the pristine worker (CPU) and the in-process TPU path so both
    produce identical calling conventions.
    """
    import jax
    import numpy as np
    from jax import export as jexport
    from jax.experimental.serialize_executable import serialize
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    exp = jexport.deserialize(bytearray(exp_bytes))
    # Explicit fully-replicated input shardings: a deserialized executable
    # is loaded over every addressable device and does NOT auto-commit
    # inputs like jit does, so the compile-time layout must match what
    # load_serving will reconstruct.
    repl = NamedSharding(Mesh(np.array(jax.devices()), ("d",)),
                         PartitionSpec())
    specs = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in exp.in_avals]
    # keep_unused: XLA normally prunes args the program never reads (e.g. a
    # frozen stat the eval path ignores), which would desync the serialized
    # executable's calling convention from the (variables, batch) leaf list.
    compiled = (jax.jit(exp.call, in_shardings=repl, keep_unused=True)
                .lower(*specs).compile())
    return serialize(compiled)


def main(req_path: str, reply_path: str) -> None:
    with open(req_path, "rb") as f:
        req = pickle.load(f)

    if req["platform"] == "cpu":
        # detach from any ambient TPU relay; pin the virtual device count to
        # the exporting process's so the artifact loads on its topology
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        flags = [t for t in os.environ.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in t]
        flags.append(
            f"--xla_force_host_platform_device_count={req['num_devices']}")
        os.environ["XLA_FLAGS"] = " ".join(flags)
    os.environ["JAX_PLATFORMS"] = req["platform"]

    import jax
    jax.config.update("jax_platforms", req["platform"])
    # an export must be a genuine fresh compile: an executable AOT-loaded
    # from the persistent cache re-serializes with dangling references
    jax.config.update("jax_enable_compilation_cache", False)

    payload, aot_in_tree, aot_out_tree = compile_and_serialize(req["payload"])
    with open(reply_path, "wb") as f:
        pickle.dump(dict(payload=payload, aot_in_tree=aot_in_tree,
                         aot_out_tree=aot_out_tree), f)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
