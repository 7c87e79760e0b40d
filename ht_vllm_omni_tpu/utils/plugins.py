"""General plugin loading.

Counterpart of the reference's plugin loader (reference
vllm_omni/plugins/__init__.py load_omni_general_plugins): discovers
entry points in the ``ht_vllm_omni_tpu.general_plugins`` group and
calls each once at engine start-up, letting deployments register extra
model families, stage builders, or connectors without forking."""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

PLUGIN_GROUP = "ht_vllm_omni_tpu.general_plugins"
_loaded = False


def load_general_plugins(force: bool = False) -> list[str]:
    """Load every registered plugin once; returns loaded names.

    ``HT_VLLM_OMNI_TPU_PLUGINS`` (comma-separated names) restricts the
    set, mirroring the reference's VLLM_PLUGINS filter."""
    global _loaded
    if _loaded and not force:
        return []
    _loaded = True
    allowed = os.environ.get("HT_VLLM_OMNI_TPU_PLUGINS")
    allow = (
        {s.strip() for s in allowed.split(",") if s.strip()}
        if allowed is not None
        else None
    )
    from importlib.metadata import entry_points

    loaded = []
    try:
        eps = entry_points(group=PLUGIN_GROUP)
    except TypeError:  # py<3.10 signature
        eps = entry_points().get(PLUGIN_GROUP, [])
    for ep in eps:
        if allow is not None and ep.name not in allow:
            logger.info("skipping plugin %s (not in allow-list)", ep.name)
            continue
        try:
            hook = ep.load()
            hook()
            loaded.append(ep.name)
            logger.info("loaded general plugin %s", ep.name)
        except Exception:
            logger.exception("plugin %s failed to load", ep.name)
    return loaded
