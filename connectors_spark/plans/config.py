"""Typed source-configuration schema — Field/dependencies/defaults.

Re-expresses the reference's configurable-field machinery (reference:
libs/connectors_sdk/connectors_sdk/source.py:41-258 Field +
DataSourceConfiguration) so source registrations validate their options
the way the reference validates connector configurations:

- type coercion to str/int/float/bool/list with the reference's
  list-from-comma-string splitting and empty-item dropping;
- `value` falls back to `default_value` only when the field is NOT
  required and its value is empty (source.py:112-123);
- validations: less_than, greater_than, list_type, included_in, regex
  (source.py:186-258), verbatim error strings;
- depends_on gating: a field is validated only when every dependency
  field currently holds the required value.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

TYPE_DEFAULTS = {"str": "", "int": None, "float": None, "bool": None, "list": []}
_CASTS = {"str": str, "int": int, "float": float, "bool": bool}


class ConfigValidationError(ValueError):
    def __init__(self, errors: list[str]):
        super().__init__("; ".join(errors))
        self.errors = errors


def _convert(value, field_type: str):
    """Field._convert (source.py:129-165)."""
    if field_type not in TYPE_DEFAULTS:
        return value
    if field_type == "list":
        if isinstance(value, list):
            return value
        if isinstance(value, str):
            return [it.strip() for it in value.split(",") if it.strip()] if value else []
        if isinstance(value, int):
            return [value]
        if isinstance(value, set):
            return list(value)
        if isinstance(value, dict):
            return list(value.items())
        return [value] if value is not None else []
    cast = _CASTS[field_type]
    if isinstance(value, cast):
        return value
    if value is None or value == "":
        return TYPE_DEFAULTS[field_type]
    return cast(value)


@dataclass
class Field:
    name: str
    default_value: object = None
    depends_on: list = dc_field(default_factory=list)  # [{"field","value"}]
    label: str | None = None
    required: bool = True
    field_type: str = "str"
    validations: list = dc_field(default_factory=list)  # [{"type","constraint"}]
    value: object = None

    def __post_init__(self):
        if self.label is None:
            self.label = self.name
        self.default_value = _convert(self.default_value, self.field_type)
        self.value = _convert(self.value, self.field_type)

    def is_value_empty(self) -> bool:
        v = self.value
        if isinstance(v, str):
            return v == ""
        if isinstance(v, list):
            return len(v) == 0 or all(x in (None, "") for x in v)
        return v is None

    def effective_value(self):
        """value, or default_value for a non-required empty field."""
        if self.required:
            return self.value
        return self.default_value if self.is_value_empty() else self.value

    def validate(self) -> list[str]:
        value, label = self.effective_value(), self.label
        errors: list[str] = []
        for v in self.validations:
            vt, constraint = v["type"], v["constraint"]
            if vt == "less_than":
                if not value < constraint:
                    errors.append(
                        f"'{label}' value '{value}' should be less than {constraint}."
                    )
            elif vt == "greater_than":
                if not value > constraint:
                    errors.append(
                        f"'{label}' value '{value}' should be greater than {constraint}."
                    )
            elif vt == "list_type":
                if not isinstance(value, list):
                    errors.append(
                        f"Cannot list_type validate '{label}' because its "
                        f"value '{value}' is not a list."
                    )
                    continue
                for item in value:
                    if (constraint == "str" and not isinstance(item, str)) or (
                        constraint == "int" and not isinstance(item, int)
                    ):
                        errors.append(
                            f"'{label}' list value '{item}' should be of "
                            f"type {constraint}."
                        )
            elif vt == "included_in":
                items = value if isinstance(value, list) else [value]
                for item in items:
                    if item not in constraint:
                        opts = ", ".join(str(x) for x in constraint)
                        errors.append(
                            f"'{label}' list value '{item}' should be one of {opts}."
                        )
            elif vt == "regex":
                if not isinstance(value, str):
                    errors.append(
                        f"Cannot regex validate '{label}' because "
                        f"'{value}' is not a string."
                    )
                    continue
                if not re.fullmatch(constraint, value):
                    errors.append(
                        f"'{label}' value '{value}' failed regex check {constraint}."
                    )
        return errors


class SourceConfiguration:
    """DataSourceConfiguration analog: a named Field set with
    dependency-gated validation."""

    def __init__(self, fields: list[Field]):
        self.fields = {f.name: f for f in fields}

    def set_values(self, **values) -> "SourceConfiguration":
        for k, v in values.items():
            if k not in self.fields:
                raise ConfigValidationError([f"unknown config field '{k}'"])
            f = self.fields[k]
            f.value = _convert(v, f.field_type)
        return self

    def get(self, name: str):
        return self.fields[name].effective_value()

    def dependencies_satisfied(self, f: Field) -> bool:
        for dep in f.depends_on:
            df = self.fields.get(dep["field"])
            if df is None or df.effective_value() != dep["value"]:
                return False
        return True

    def check_valid(self) -> None:
        """Raises ConfigValidationError listing every violation: missing
        required fields (dependencies satisfied) + per-field validations."""
        errors: list[str] = []
        for f in self.fields.values():
            if not self.dependencies_satisfied(f):
                continue  # inactive field: never validated
            if f.required and f.is_value_empty():
                errors.append(f"Field validation errors: '{f.label}' cannot be empty.")
                continue
            errors.extend(f.validate())
        if errors:
            raise ConfigValidationError(errors)
