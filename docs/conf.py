# Sphinx configuration for the cora_tpu documentation.
#
# Mirrors the reference's docs-as-CI-gate practice
# (reference .github/workflows/main.yaml:75-97: sphinx-build with -W);
# the markdown sources are rendered through myst-parser.

project = "cora-tpu"
author = "cora-tpu developers"

extensions = ["myst_parser"]

source_suffix = {
    ".rst": "restructuredtext",
    ".md": "markdown",
}

master_doc = "index"

# the hand-written pages use bare reference-style labels (e.g.
# "[radiocosmology/cora]") as plain text; don't fail the -W gate on them
suppress_warnings = ["myst.xref_missing"]
myst_heading_anchors = 3

exclude_patterns = ["_build"]

html_theme = "alabaster"
