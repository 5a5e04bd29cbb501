"""Lazy-import helper for CLI subcommands
(`maua/cli/__init__.py:4-8`)."""


def lazy(module_path: str, fn_name: str = "main"):
    def run(args=None):
        import importlib

        mod = importlib.import_module(module_path)
        return getattr(mod, fn_name)(args)

    return run
