"""etl_hero_spark — a PySpark-native data-cleaning / ETL analytics engine.

Re-expresses the capabilities of the reference app (ClaudioCurzi/etl-hero,
a single-file pandas+Streamlit data-cleaning tool, /root/reference/app.py)
as a lazy, distributed operator library designed for 100 TB scale:

    profile  -> detect  -> remediate  -> score  -> report
    (P1, A*)    (P2-P5)    (R1-R4)       (M1-M2)   (M3, S4-S5)

plus large-scale training-data-pipeline extensions: exact & near
deduplication, similarity search over embeddings, text analysis, and
Structured-Streaming equivalents of the batch detectors.

Design rules (see SURVEY.md §7):
  * DataFrame/SQL API only; Catalyst plans everything. No RDDs.
  * One-pass multi-aggregate profiling (a single df.agg for all columns).
  * Scalar statistics flow back into plans via broadcast 1-row DataFrames
    (crossJoin) so remediation stays lazy, or via a single collected agg.
  * Approximate sketches (HLL++, t-digest percentiles) behind approx=True
    for the 100 TB path; exact variants for oracle-checked correctness.
  * Python UDFs only where no native expression exists (Arrow-batched).
"""

from etl_hero_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
