"""File / test sinks with per-epoch idempotence."""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class ParquetEpochSink:
    """Parquet sink writing each epoch to a deterministic path with overwrite.

    Idempotence: replaying epoch N overwrites ``{path}/epoch={N}/`` in place —
    the file-sink analog of the reference's Kafka transaction (a replayed
    epoch produces the same data under the same identity instead of
    appending duplicates). Readers see the union via partition discovery:
    ``spark.read.parquet(path)`` exposes ``epoch`` as a partition column.

    At scale: one directory per epoch keeps commits O(batch), not O(history),
    and lets downstream consumers do partition-pruned incremental reads.
    """

    path: str

    def write(self, df: DataFrame, epoch: int) -> None:
        df.write.mode("overwrite").parquet(os.path.join(self.path, f"epoch={epoch}"))

    def read(self, spark) -> DataFrame:
        return spark.read.option("basePath", self.path).parquet(self.path + "/epoch=*")


@dataclass
class MemorySink:
    """Test sink collecting rows per epoch; replays overwrite (idempotent)."""

    epochs: dict[int, list] = field(default_factory=dict)
    fail_on_epochs: set = field(default_factory=set)
    fail_once_on_epochs: set = field(default_factory=set)

    def write(self, df: DataFrame, epoch: int) -> None:
        if epoch in self.fail_on_epochs:
            raise RuntimeError(f"injected failure at epoch {epoch}")
        if epoch in self.fail_once_on_epochs:
            self.fail_once_on_epochs.discard(epoch)
            raise RuntimeError(f"injected one-shot failure at epoch {epoch}")
        self.epochs[epoch] = df.collect()

    @property
    def rows(self) -> list:
        return [r for e in sorted(self.epochs) for r in self.epochs[e]]


@dataclass
class ConsoleSink:
    n: int = 20

    def write(self, df: DataFrame, epoch: int) -> None:
        print(f"=== epoch {epoch} ===")
        df.show(self.n, truncate=False)
