"""ComfyUI entrypoint: drop this directory into ComfyUI/custom_nodes."""

from .comfyui_ht_omni import (  # noqa: F401
    NODE_CLASS_MAPPINGS,
    NODE_DISPLAY_NAME_MAPPINGS,
)
