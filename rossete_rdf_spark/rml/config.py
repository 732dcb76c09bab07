"""Engine configuration: per-source-file read options + output format.

Mirrors the reference's JSON config surface (reference: src/config.rs):
  - "files-data": [{"path", "encoding", "file-type", "delimiter", "header"}]
    (parsed at src/config.rs:234-272; FileSpecs defaults delimiter=',',
    header=true, encoding=UTF-8 at src/config.rs:325-333)
  - "output-format": "nt" | "ttl" (src/config.rs:221-229; otherwise chosen
    by output-file extension, src/config.rs:20-34,110)
  - "threads" and "max-memory-usage" are accepted but ignored: Spark's task
    scheduler replaces the [parse, read, write] thread caps
    (src/config.rs:275-297) and Tungsten spill replaces the in-memory-DB
    threshold (src/config.rs:203-220).

Encodings: the reference maps ~40 WHATWG names onto encoding_rs
(src/config.rs:378-425); Spark's CSV reader takes the charset name directly
(java.nio.charset), which covers the same WHATWG set — we pass the name
through verbatim and let the JVM resolve it.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class FileSpec:
    """Per-data-file read options (reference FileSpecs, src/config.rs:302-333)."""

    delimiter: str = ","
    header: bool = True
    encoding: str = "UTF-8"
    file_type: str | None = None  # overrides extension sniffing when set


@dataclass
class EngineConfig:
    file_specs: dict[str, FileSpec] = field(default_factory=dict)
    output_format: str | None = None  # 'nt' | 'ttl' | None (by extension)
    # The reference's XML reader is a stub that stages ZERO rows
    # (src/input.rs:400-435) and golden parity depends on that (the
    # #TransportMapping contributes nothing to ex_out.ttl). xml_real=True
    # opts into an actual XML source: XPath-style iterator over elements,
    # fields from child-element text / @attributes.
    xml_real: bool = False

    def spec_for(self, path: str) -> FileSpec | None:
        """Match by normalized absolute-or-suffix path, like the reference's
        PathBuf-keyed HashMap (src/config.rs:122-124)."""
        norm = os.path.normpath(path)
        if norm in self.file_specs:
            return self.file_specs[norm]
        base = os.path.basename(norm)
        for k, v in self.file_specs.items():
            if os.path.basename(k) == base:
                return v
        return None


def load_config(path: str) -> EngineConfig:
    with open(path, encoding="utf-8") as f:
        data = json.load(f)
    return config_from_json(data, base_dir=os.path.dirname(os.path.abspath(path)))


def config_from_json(data: dict, base_dir: str | None = None) -> EngineConfig:
    cfg = EngineConfig()
    for spec in data.get("files-data", []) or []:
        p = spec.get("path")
        if not p:
            # reference hard-errors on a missing "path" (src/config.rs:243-248)
            raise ValueError('files-data entry lacks required "path"')
        if base_dir and not os.path.isabs(p):
            p = os.path.join(base_dir, p)
        cfg.file_specs[os.path.normpath(p)] = FileSpec(
            delimiter=str(spec.get("delimiter", ","))[:1] or ",",
            header=bool(spec.get("header", True)),
            encoding=str(spec.get("encoding", "UTF-8")).upper(),
            file_type=spec.get("file-type"),
        )
    of = data.get("output-format")
    if of is not None:
        cfg.output_format = str(of).lower()
    cfg.xml_real = bool(data.get("xml-real", False))
    return cfg
