"""YAML pipeline-language loader: parse, imports, merge, CLI variables.

Reference semantics (re-implemented, not copied):
- F1 YAML load            — /root/reference/pandas_etl/etl.py:109-203,209-222
- F2 imports resolution   — etl.py:301-336
- F3 deep merge           — etl.py:224-299 (dicts recurse; lists *prepend*
  imported items; multiline strings prepend with marker comments; scalars
  replace; new keys added; type mismatch raises unless imported is None)
- F4 CLI variable parsing — etl.py:14-37

Deliberate divergence (SURVEY §7): ``yaml.safe_load`` instead of
FullLoader (the reference's loader can construct arbitrary objects).
Error-message text matches the reference so ported tests assert equal.
"""

from __future__ import annotations

import os
from typing import Any

import yaml


def parse_command_line_variables(variables: list[str]) -> dict[str, str]:
    """``name=value`` pairs → dict; rejects anything but exactly one '='."""
    output: dict[str, str] = {}
    for var in variables:
        parts = var.split("=")
        if len(parts) != 2:
            raise ValueError(
                f"Invalid command line for variable '{var}' Expected format as varName=varValue"
            )
        output[parts[0].strip()] = parts[1].strip()
    return output


def from_yaml_to_dict(yaml_str: str) -> dict:
    return yaml.safe_load(yaml_str)


def merge_yaml_dict(
    main_yaml: dict, to_be_imported_yaml: dict, imported_name: str | None = None
) -> dict:
    """Deep merge with the reference's exact rules (etl.py:224-299)."""
    for key, val in main_yaml.items():
        if key in to_be_imported_yaml and type(to_be_imported_yaml[key]) is not type(val):
            if to_be_imported_yaml[key] is None:
                continue
            raise ValueError(
                f"Type mismatch in imported YAML file. Expected for property '{key}' "
                f"type '{type(val)}' but got type '{type(to_be_imported_yaml[key])}'"
            )
        if isinstance(val, dict):
            if key in to_be_imported_yaml:
                main_yaml[key].update(
                    merge_yaml_dict(main_yaml[key], to_be_imported_yaml[key], imported_name)
                )
        elif isinstance(val, list):
            if key in to_be_imported_yaml:
                # imported list items go to the FRONT
                main_yaml[key] = to_be_imported_yaml[key] + main_yaml[key]
        elif isinstance(val, str):
            if key in to_be_imported_yaml:
                if val.count("\n") > 0:
                    # imported multiline text prepends, with provenance markers
                    before = (
                        f"# Below imported from: {imported_name}\n"
                        if imported_name is not None
                        else ""
                    )
                    after = (
                        f"\n# Above imported from: {imported_name}\n"
                        if imported_name is not None
                        else ""
                    )
                    main_yaml[key] = before + to_be_imported_yaml[key] + after + main_yaml[key]
                else:
                    main_yaml[key] = to_be_imported_yaml[key]
        else:
            if key in to_be_imported_yaml:
                main_yaml[key] = to_be_imported_yaml[key]

    for key, val in to_be_imported_yaml.items():
        if key not in main_yaml:
            main_yaml[key] = val
    return main_yaml


def resolve_imports(yaml_data: dict) -> dict:
    """Recursively load + merge ``imports:`` files (depth-first: nested
    imports resolve before merging into the parent)."""
    if "imports" in yaml_data.keys():
        for imp in yaml_data.get("imports", []) or []:
            if os.path.exists(imp):
                if imp.endswith((".yml", ".yaml")):
                    with open(imp, encoding="utf-8") as f:
                        imported = from_yaml_to_dict(f.read())
                else:
                    raise ValueError(f"Wrong file extension for the import: {imp}")
            else:
                raise FileNotFoundError(f"No such file: {imp}")
            imported = resolve_imports(imported)
            yaml_data = merge_yaml_dict(yaml_data, imported, imp)
    return yaml_data


def load_yaml_data(yaml_data: str | dict) -> dict:
    """File path, YAML text, or already-parsed dict → dict."""
    if isinstance(yaml_data, str):
        if os.path.exists(yaml_data):
            with open(yaml_data, encoding="utf-8") as f:
                yaml_data = f.read()
        parsed = from_yaml_to_dict(yaml_data)
        if not isinstance(parsed, dict):
            raise ValueError("Pipeline YAML must parse to a mapping")
        return parsed
    if isinstance(yaml_data, dict):
        return yaml_data
    raise TypeError(f"yamlData must be str or dict, got {type(yaml_data)}")
