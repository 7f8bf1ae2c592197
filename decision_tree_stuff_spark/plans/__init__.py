"""Alternative physical training plans for the decision tree."""

from decision_tree_stuff_spark.plans.level_wise import fit_level_wise

__all__ = ["fit_level_wise"]
