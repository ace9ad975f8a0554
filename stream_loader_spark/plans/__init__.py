"""Query catalog: the declared, oracle-checkable operator inventory."""
