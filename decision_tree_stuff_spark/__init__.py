"""decision_tree_stuff_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``dsillman2000/decision-tree-stuff`` (a Polars binary decision-tree
classifier, see /root/reference/decision_tree_stuff/) as idiomatic
PySpark DataFrame programs, plus large-scale data-pipeline operators
(dedup, similarity search, text analysis, sessionization) designed
for 100 TB-class inputs.

Public surface mirrors the reference package exports
(reference __init__.py:1-3): ``DecisionTree``, ``DecisionTreeParams``.
"""

from decision_tree_stuff_spark.dtree import DecisionTree, DecisionTreeParams
from decision_tree_stuff_spark.forest import DecisionForest, ForestParams

__all__ = [
    "DecisionTree",
    "DecisionTreeParams",
    "DecisionForest",
    "ForestParams",
]
