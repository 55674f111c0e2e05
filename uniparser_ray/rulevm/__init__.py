"""Pure rule VM — zero Ray dependencies.

The per-document extraction kernel: parsers, rule containers, chain
evaluation.  Semantics follow the public reference engine
(ClericPy/uniparser, see /root/reference) but every line here is a
from-scratch implementation over the Python stdlib + jsonpath_ng/yaml.
"""
