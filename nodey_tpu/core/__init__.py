"""Core runtime: graph, registry, errors, compiler, runner."""
