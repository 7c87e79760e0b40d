"""Name -> connector class resolution (reference omni_connectors/factory.py)."""

from __future__ import annotations

from typing import Any, Type

from ht_vllm_omni_tpu.distributed.connectors.base import OmniConnectorBase


class OmniConnectorFactory:
    _registry: dict[str, Type[OmniConnectorBase]] = {}

    @classmethod
    def register(cls, name: str, klass: Type[OmniConnectorBase]) -> None:
        cls._registry[name] = klass

    @classmethod
    def create(cls, name: str, **extra: Any) -> OmniConnectorBase:
        klass = cls._registry.get(name)
        if klass is None:
            raise ValueError(
                f"unknown connector {name!r}; known: {list(cls._registry)}"
            )
        return klass(**extra)


def _register_builtins() -> None:
    from ht_vllm_omni_tpu.distributed.connectors.inmemory import (
        InMemoryConnector,
    )
    from ht_vllm_omni_tpu.distributed.connectors.shm import (
        SharedMemoryConnector,
    )

    OmniConnectorFactory.register("InMemoryConnector", InMemoryConnector)
    OmniConnectorFactory.register("MockConnector", InMemoryConnector)
    OmniConnectorFactory.register(
        "SharedMemoryConnector", SharedMemoryConnector
    )
    from ht_vllm_omni_tpu.distributed.connectors.tcp import TcpConnector

    OmniConnectorFactory.register("TcpConnector", TcpConnector)

    # Native C++ data plane (Mooncake-TransferEngine-equivalent); falls
    # back to the Python TCP connector when no toolchain is available.
    from ht_vllm_omni_tpu.native.transfer import native_available

    if native_available():
        from ht_vllm_omni_tpu.distributed.connectors.native_tcp import (
            NativeTcpConnector,
        )

        OmniConnectorFactory.register(
            "NativeTcpConnector", NativeTcpConnector
        )
        # drop-in names for reference configs written for Mooncake
        OmniConnectorFactory.register(
            "MooncakeStoreConnector", NativeTcpConnector
        )
        OmniConnectorFactory.register(
            "MooncakeTransferEngineConnector", NativeTcpConnector
        )
    else:  # pragma: no cover - toolchain-less host
        OmniConnectorFactory.register("NativeTcpConnector", TcpConnector)
        OmniConnectorFactory.register("MooncakeStoreConnector", TcpConnector)
        OmniConnectorFactory.register(
            "MooncakeTransferEngineConnector", TcpConnector
        )


_register_builtins()
