"""Per-dataset preprocessors → unified index format (SURVEY.md C16).

Each submodule converts one dataset's native annotation layout into the
index contract of data/indexes.py. `install_dataset.py`-equivalent CLI:
yourmt3_tpu/cli/install_dataset.py (download is documented but disabled in
this offline environment; converters run on local copies).
"""

from . import synth  # noqa: F401
