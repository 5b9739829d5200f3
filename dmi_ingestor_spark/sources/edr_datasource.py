"""Spark 4 Python DataSource for the OGC-EDR cube API (SURVEY.md S1/S2).

``spark.read.format("dmi_edr")`` as a first-class source: one input
partition per forecast parameter (the reference's loop unit,
``dmi_ingestor/ingestor.py:157``), fetch+decode on executors, long-form
grid rows out. This supersedes SURVEY §4.2's "plan-time request
construction suffices" note — the Spark 4 Python DataSource API makes a
real source adapter cheap, and it buys genuine Catalyst integration:

* partition pruning via filter pushdown: ``parameter = 'x'`` / ``IN``
  prune whole fetch partitions (the `parameter-name` query param is the
  server-side projection, `ingestor.py:178`);
* everything else stays declarative — the scan yields plain rows, so
  bbox slicing, rollups, and writes run as normal Catalyst plans.

Offline by default: ``.option("transport", "synthetic")`` serves the
deterministic test cube; "http" does the real fetch (network not
available in CI, mirrored from ``http_edr._default_transport``).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from dmi_ingestor_spark.sources.http_edr import IngestConfig, build_request_url

GRID_DDL = (
    "collection string, parameter string, time_s long, "
    "y double, x double, value double"
)


@dataclass
class _ParamPartition(InputPartition):
    collection: str
    parameter: str
    url: str
    transport: str


class EdrReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.collection = options.get("collection", "dkss_if")
        params = options.get("parameters", "sea-mean-deviation")
        self.parameters = [p for p in params.split(",") if p]
        self.bbox = options.get("bbox", "11.5,55.5,12.2,56.1")
        self.api_key = options.get("api_key", "")
        self.transport = options.get("transport", "synthetic")

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Prune fetch partitions from parameter predicates; everything
        else is returned as unsupported (Spark re-applies it)."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("parameter",):
                self.parameters = [p for p in self.parameters if p == f.value]
            elif isinstance(f, In) and f.attribute == ("parameter",):
                allowed = set(f.values)
                self.parameters = [p for p in self.parameters if p in allowed]
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        cfg = IngestConfig(
            collection=self.collection,
            parameters=tuple(self.parameters),
            bbox=self.bbox,
            api_key=self.api_key,
        )
        return [
            _ParamPartition(
                self.collection, p, build_request_url(cfg, p), self.transport
            )
            for p in self.parameters
        ]

    def read(self, partition: _ParamPartition) -> Iterator[tuple]:
        from dmi_ingestor_spark.sources.cube_format import (
            decode_cube,
            encode_cube,
            synthetic_cube,
        )

        if partition.transport == "synthetic":
            payload = encode_cube(
                synthetic_cube(
                    partition.parameter,
                    lambert=partition.collection.startswith("harmonie"),
                )
            )
        else:  # pragma: no cover - network path
            import requests

            resp = requests.get(partition.url, timeout=120)
            resp.raise_for_status()
            payload = resp.content
        cube = decode_cube(payload)
        for t_i, t in enumerate(cube.times):
            for y_i, y in enumerate(cube.ys):
                for x_i, x in enumerate(cube.xs):
                    yield (
                        partition.collection,
                        partition.parameter,
                        int(t),
                        float(y),
                        float(x),
                        float(cube.values[t_i, y_i, x_i]),
                    )


class EdrDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "dmi_edr"

    def schema(self) -> str:
        return GRID_DDL

    def reader(self, schema: StructType) -> EdrReader:
        return EdrReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> "EdrStreamReader":
        return EdrStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "ManifestJsonlWriter":
        return ManifestJsonlWriter(self.options, schema, overwrite)


def register(spark) -> None:
    spark.dataSource.register(EdrDataSource)


class EdrStreamReader(SimpleDataSourceStreamReader):
    """Streaming EDR source: one micro-batch per forecast cycle (St6).

    The reference re-runs its container per cycle and deletes the old
    forecast (``dmi_ingestor/ingestor.py:199``); here each cycle is an
    incremental micro-batch with exactly-once offsets in the checkpoint.
    Offsets are ``{"cycle": n}``; ``max_cycles`` bounds the synthetic
    feed so tests drain it (a live feed would poll the API forever).
    """

    CYCLE_STEP_S = 4 * 3600  # one synthetic cycle = 4 hourly steps

    def __init__(self, options: dict) -> None:
        self.collection = options.get("collection", "dkss_if")
        self.parameter = options.get("parameters", "sea-mean-deviation").split(",")[0]
        self.max_cycles = int(options.get("max_cycles", "3"))

    def initialOffset(self) -> dict:
        return {"cycle": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        from dmi_ingestor_spark.sources.cube_format import synthetic_cube

        cycle = start["cycle"]
        if cycle >= self.max_cycles:
            return iter([]), start
        cube = synthetic_cube(
            self.parameter,
            t0=1_767_225_600 + cycle * self.CYCLE_STEP_S,
            lambert=self.collection.startswith("harmonie"),
        )
        rows = [
            (
                self.collection,
                self.parameter,
                int(t),
                float(y),
                float(x),
                float(cube.values[t_i, y_i, x_i]),
            )
            for t_i, t in enumerate(cube.times)
            for y_i, y in enumerate(cube.ys)
            for x_i, x in enumerate(cube.xs)
        ]
        return iter(rows), {"cycle": cycle + 1}


# ---------------------------------------------------------------------------
# Writer side (S8 manifest sink as a first-class Python DataSource)
# ---------------------------------------------------------------------------


@dataclass
class _PartFile(WriterCommitMessage):
    filename: str
    n_rows: int


class ManifestJsonlWriter(DataSourceWriter):
    """``df.write.format("dmi_edr").option("path", dir).save()`` —
    the reference's publish step (`dmi_ingestor/ingestor.py:108-118`:
    per-band upload + one JSON manifest) as a Spark 4 Python
    DataSourceWriter with the committer protocol done right:

    * each task streams its partition to ``_tmp.part-NNNNN.jsonl``
      and returns a commit message (filename, row count);
    * ``commit()`` — driver-side, exactly once, only after EVERY task
      succeeded — renames the temp files into place and writes
      ``_MANIFEST.json`` (file list + per-file and total row counts),
      the atomic "the dataset is now complete" marker readers key on;
    * ``abort()`` removes temp files, so a failed job leaves no
      half-published output — the keep-last-good semantics the
      reference's delete-then-write loop lacks.

    Local-FS rename here; on an object store the same protocol rides
    the Hadoop committer (cf. ingest/fs.py).
    """

    def __init__(self, options: dict, schema: StructType, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("dmi_edr writer requires .option('path', ...)")
        self.field_names = list(schema.fieldNames())
        self.overwrite = overwrite

    def write(self, iterator) -> _PartFile:
        import json
        import os

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{pid:05d}.jsonl"
        tmp = os.path.join(self.path, f"_tmp.{name}")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(self.field_names, row)), sort_keys=True))
                fh.write("\n")
                n += 1
        return _PartFile(filename=name, n_rows=n)

    def commit(self, messages) -> None:
        import json
        import os

        files = {}
        for m in messages:
            tmp = os.path.join(self.path, f"_tmp.{m.filename}")
            os.replace(tmp, os.path.join(self.path, m.filename))
            files[m.filename] = m.n_rows
        manifest = {
            "files": dict(sorted(files.items())),
            "n_files": len(files),
            "n_rows": sum(files.values()),
            "columns": self.field_names,
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
            json.dump(manifest, fh, sort_keys=True, indent=1)

    def abort(self, messages) -> None:
        import glob
        import os

        for tmp in glob.glob(os.path.join(self.path, "_tmp.part-*.jsonl")):
            try:
                os.remove(tmp)
            except OSError:
                pass
