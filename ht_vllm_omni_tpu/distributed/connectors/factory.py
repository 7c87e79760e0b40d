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

    # Mooncake drop-in names stay pinned to the Python TCP wire: the two
    # protocols are wire-incompatible, so the choice must be an explicit
    # config decision on BOTH ends, never per-host toolchain autodetect
    # (a native client against a Python server silently hangs the data
    # plane).  Opt into the C++ engine by naming NativeTcpConnector.
    OmniConnectorFactory.register("MooncakeStoreConnector", TcpConnector)
    from ht_vllm_omni_tpu.distributed.connectors.fsstore import (
        FsStoreConnector,
    )

    OmniConnectorFactory.register("FsStoreConnector", FsStoreConnector)
    # the reference's Yuanrong datasystem slot: a shared filesystem is
    # the equivalent cluster substrate here (fsstore.py module note)
    OmniConnectorFactory.register("YuanrongConnector", FsStoreConnector)
    OmniConnectorFactory.register(
        "MooncakeTransferEngineConnector", TcpConnector
    )

    # Native C++ data plane (Mooncake-TransferEngine-equivalent).  The
    # class import is cheap; the g++ build is deferred to first
    # instantiation (NativeTcpConnector.__init__ -> transfer._load), so
    # importing the connectors package never shells out to a compiler.
    from ht_vllm_omni_tpu.distributed.connectors.native_tcp import (
        NativeTcpConnector,
    )

    OmniConnectorFactory.register("NativeTcpConnector", NativeTcpConnector)


_register_builtins()
