"""Multi-tree registry: the reference's data model supports many synthetic
trees but hides the `synth_id` argument ("temporary, for hiding the
multitree stuff", tree_of_life_v3.java:75-76). Here tree_id is first-class
(SURVEY.md §7 risk 5): the parquet store is partitioned by tree_id, and the
registry resolves synth_id -> GraphStore with the reference's defaulting and
error semantics.
"""

from __future__ import annotations

import os

from treemachine_spark.api.errors import BadInputError
from treemachine_spark.ingest import GraphStore, load_store


class TreeRegistry:
    def __init__(self, stores: dict[str, GraphStore]):
        self._stores = dict(stores)

    @classmethod
    def load(cls, spark, base_dir: str) -> "TreeRegistry":
        """Load every tree store under base_dir/<tree_id>/."""
        stores = {}
        for name in sorted(os.listdir(base_dir)):
            sub = os.path.join(base_dir, name)
            if os.path.isdir(sub) and os.path.exists(os.path.join(sub, "tree_meta.json")):
                store = load_store(spark, sub)
                stores[store.tree_id] = store
        return cls(stores)

    def add(self, store: GraphStore) -> None:
        self._stores[store.tree_id] = store

    def tree_ids(self) -> list[str]:
        """L9 — sorted distinct synth tree ids (GraphExplorer.getSynthTreeIDs,
        GraphExplorer.java:95-107)."""
        return sorted(self._stores)

    def most_recent(self) -> str:
        """L10 — top-1 most recent tree (GraphExplorer.
        getMostRecentSynthTreeID, GraphExplorer.java:110-114): last element
        of the sorted id list."""
        ids = self.tree_ids()
        if not ids:
            raise BadInputError("no synthetic trees ingested")
        return ids[-1]

    def get(self, synth_id: str | None = None) -> GraphStore:
        """synth_id resolution with the reference's error message
        (tree_of_life_v3.java:80-89)."""
        if synth_id is None:
            return self._stores[self.most_recent()]
        if synth_id not in self._stores:
            raise BadInputError(
                "Could not find a synthetic tree corresponding to the "
                f"'synth_id' arg: '{synth_id}'. Leave blank to default to "
                "the current synthetic tree."
            )
        return self._stores[synth_id]


class TreeOfLifeService:
    """synth_id-aware facade over per-tree TreeOfLifeV3 instances — the
    endpoint surface the reference would expose with multitree un-hidden."""

    def __init__(self, registry: TreeRegistry, **api_kwargs):
        from treemachine_spark.api.v3 import TreeOfLifeV3

        self._v3 = TreeOfLifeV3
        self.registry = registry
        self._api_kwargs = api_kwargs
        self._apis: dict[str, object] = {}

    def _api(self, synth_id: str | None):
        store = self.registry.get(synth_id)
        if store.tree_id not in self._apis:
            self._apis[store.tree_id] = self._v3(store, **self._api_kwargs)
        return self._apis[store.tree_id]

    def about(self, include_source_list: bool = False, synth_id: str | None = None):
        return self._api(synth_id).about(include_source_list)

    def node_info(self, node_id=None, ott_id=None, include_lineage=False, synth_id=None):
        return self._api(synth_id).node_info(node_id, ott_id, include_lineage)

    def mrca(self, node_ids=None, ott_ids=None, synth_id=None):
        return self._api(synth_id).mrca(node_ids, ott_ids)

    def subtree(self, synth_id=None, **kw):
        return self._api(synth_id).subtree(**kw)

    def induced_subtree(self, node_ids=None, ott_ids=None, label_format=None, synth_id=None):
        return self._api(synth_id).induced_subtree(node_ids, ott_ids, label_format)
