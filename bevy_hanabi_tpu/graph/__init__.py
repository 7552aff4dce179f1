"""Effect expression graph: Module/Expr arena and the fluent ExprWriter."""

from .expr import (  # noqa: F401
    BinaryOp,
    BuiltInOp,
    Expr,
    ExprHandle,
    ExprWriter,
    Module,
    TernaryOp,
    UnaryOp,
    WriterExpr,
)
