from pocketflow_tpu.automl.search import (GPSearch, ParamSpec, RandomSearch,
                                          run_automl)

__all__ = ['GPSearch', 'ParamSpec', 'RandomSearch', 'run_automl']
