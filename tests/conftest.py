"""Test harness: force an 8-device virtual CPU platform BEFORE jax import.

The reference exercises its multi-GPU paths only by running real
torchrun/accelerate jobs (SURVEY.md §4); here every mesh/pjit test runs
hermetically on 8 virtual CPU devices.
"""

import os

# The image pins JAX_PLATFORMS=axon (the real-TPU tunnel) and its
# sitecustomize imports jax at interpreter startup, so env mutation is
# too late — override through jax.config before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import pytest

# CPU XLA defaults to low-precision matmuls (bf16-style accumulation);
# numerical parity tests need honest fp32.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(autouse=True, scope="module")
def _bound_compiled_executable_maps():
    """Drop compiled-executable references between test modules.

    Every XLA:CPU executable pins a handful of memory mappings (JIT'd
    code pages plus guard pages); a full-suite run compiles thousands
    of tiny programs and the process crosses ``vm.max_map_count``
    (default 65530) at around the 80% mark, at which point LLVM's next
    mmap fails and the *compiler* segfaults — observed as rc=139 (or a
    hang) in whichever test happens to compile next, with the process
    at ~63k maps. Clearing JAX's caches per module keeps the suite at a
    bounded plateau; cross-module recompiles are cheap because shapes
    are tiny and the persistent disk cache (when a runtime test has
    enabled it) serves repeats.
    """
    yield
    import gc

    jax.clear_caches()
    gc.collect()


# The quick subset (`pytest -m quick`): the invariant core at
# module granularity, chosen so a COLD host (empty XLA:CPU compile
# cache — a fresh driver/judge machine recompiles everything; the full
# suite then takes ~17 min, not the warm ~3) still finishes in a few
# minutes. Criteria: parity/spec tests that pin reference semantics
# (prompts, plans, labels, metrics) plus the host-side runtime pieces,
# excluding the model-forward-heavy e2e suites.
QUICK_MODULES = {
    "test_chat_template", "test_history_parity", "test_image_processor",
    "test_prompt_parity", "test_label_taxonomy_parity",
    "test_video_loader", "test_frame_stream", "test_sampling",
    "test_kmeans", "test_utils_io", "test_quant_utils",
    "test_datagen_eval", "test_nlp_meteor", "test_judge_http",
    "test_eval_querychain", "test_selector_cap", "test_docs_sync",
    "test_bench_artifact",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in QUICK_MODULES:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_config():
    from cogstream_tpu.config import CogReasonerConfig

    return CogReasonerConfig.tiny()


@pytest.fixture(scope="session")
def mesh8():
    import jax
    from cogstream_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh(data_parallel=2, model_parallel=4)
