#!/bin/bash
# Run the test suite on the virtual CPU mesh, detached from the axon TPU
# relay (the relay handshake in sitecustomize can stall interpreter startup
# for minutes; conftest.py runs too late to prevent it).
#
# stderr filter: every persistent-cache hit makes XLA's cpu_aot_loader.cc
# print a multi-KB ERROR about the prefer-no-gather/scatter *tuning* hints
# (LLVM Downfall-mitigation flags embedded at compile time that the loader's
# host-feature enumeration never lists — same-host entries always "mismatch").
# tests/test_compile_cache_noise.py proves the mismatch is confined to those
# hints and that a REAL ISA mismatch would still fail a test, so dropping
# exactly these lines hides noise, not signal.
# The filter is narrowed to exactly the known-benign complaint (one line
# per tuning hint), so a genuinely new error class emitted from the same
# file still surfaces in test runs.
# --smoke: the ~5-minute independent-verification lane — structures, box
# geometry, NMS Caffe2 goldens, eval-protocol fixtures (incl. the real
# reference detection dump), config/registry/solver, packing, loader +
# staging cache. No full-step compiles, no torch imports, meaningful
# green on a 1-core host in minutes (round-4 verdict item 7).
if [ "$1" = "--smoke" ]; then
  shift
  set -- tests/test_structures.py tests/test_box_ops.py tests/test_nms.py \
    tests/test_coco_eval.py tests/test_coco_eval_adversarial.py \
    tests/test_real_dump_eval.py tests/test_config.py \
    tests/test_registries.py tests/test_matcher_sampler.py \
    tests/test_solver.py tests/test_packing.py tests/test_loader.py "$@"
fi

exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  python -m pytest "${@:-tests/}" -q -p no:cacheprovider \
  2> >(grep -v --line-buffered -E 'cpu_aot_loader\.cc.*Target machine feature \+prefer-no-(gather|scatter) is not' >&2)
