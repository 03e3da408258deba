"""Pipeline object — placeholder wiring for M1/M2 (YAML language, steps,
expressions, checkpoint/resume). Filled in by the pipeline milestone."""

from __future__ import annotations


class Pipeline:
    def __init__(self, yamlData=None, includeImports=None, overrideVariables=None, spark=None):
        raise NotImplementedError("Pipeline lands with milestone M1 (SURVEY §7)")
