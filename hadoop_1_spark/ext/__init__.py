"""External-process job assets (Hadoop Streaming mapper scripts).

The reference ships streaming jobs as executable scripts the framework
forks (contrib/streaming StreamJob.java:76); these are this engine's
equivalents, located via ``asset_path`` so queries can build pipe
commands without hardcoding install paths.
"""

from __future__ import annotations

import os


def asset_path(name: str) -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), name)
