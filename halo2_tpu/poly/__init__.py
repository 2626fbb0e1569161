from .domain import EvaluationDomain, get_domain

__all__ = ["EvaluationDomain", "get_domain"]
