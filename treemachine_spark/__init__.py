"""treemachine_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of OpenTreeOfLife/treemachine (treemachine-LITE).

The reference (/root/reference) is a Neo4j 1.9 embedded graph database serving
one large phylogenetic tree. This rebuild re-expresses every traversal, ingest
and export routine as declarative DataFrame programs (SURVEY.md §2), designed
for a multi-executor cluster at 100 TB scale:

- ``sources``   — newick / taxonomy TSV / annotations JSON / NexSON readers
                  (reference: jade/tree/deprecated/TreeReader.java,
                  opentree/IngestSynthesisData.java)
- ``graph``     — ancestor-closure construction and traversal operators
                  (reference: opentree/GraphExplorer.java)
- ``operators`` — relational operator layer (lookups, joins, aggs, set ops)
- ``functions`` — scalar functions, id codecs, text analysis, dedup,
                  similarity search
- ``exporters`` — newick / CSV / DOT / GraphML / MRP sinks
                  (reference: opentree/GraphExporter.java)
- ``api``       — v3/v2 JSON response assembly
                  (reference: opentree/plugins/tree_of_life_v3.java)
- ``streaming`` — Structured Streaming ingestion & windowed analytics
                  (beyond-reference)
"""

__version__ = "0.1.0"
