"""Stage-to-stage distributed layer: connectors, transfer manager, chunks."""
