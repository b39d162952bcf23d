"""Boolean query compiler: infix AND/OR/NOT/parens -> RPN -> DataFrame joins.

Reference: shuntingYardRPN (pkg/searcher/searcher.go:572-630) and the RPN
evaluator processQuery (:633-677). The reference declares OR (-4) and NOT
(-5) tokens but leaves them unimplemented (:664-670); here all three are
live:

  AND -> inner join of doc-id sets (PostingListIntersection2, :702-719)
  OR  -> unionByName + distinct
  NOT -> left-anti join against the full corpus doc-id set

The compiler runs on the driver (queries are tiny); every operand is a
DataFrame of (doc_id) so evaluation is lazy and Catalyst fuses the join
tree into one plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PRECEDENCE = {"and": 2, "or": 1, "not": 3, "(": 0, ")": 0}


def tokenize_boolean(query: str) -> list[str]:
    out: list[str] = []
    for raw in query.replace("(", " ( ").replace(")", " ) ").split():
        out.append(raw.lower())
    return out


def to_rpn(tokens: list[str]) -> list[str]:
    """Shunting-yard, same precedence table as searcher.go:573-579
    (AND=2, OR=1, NOT=3, parens=0)."""
    output: list[str] = []
    stack: list[str] = []
    for tok in tokens:
        if tok == "(":
            stack.append(tok)
        elif tok == ")":
            while stack and stack[-1] != "(":
                output.append(stack.pop())
            if stack:
                stack.pop()
        elif tok in PRECEDENCE:
            while stack and PRECEDENCE[tok] < PRECEDENCE.get(stack[-1], -1):
                output.append(stack.pop())
            stack.append(tok)
        else:
            output.append(tok)
    while stack:
        output.append(stack.pop())
    return output


def evaluate(
    rpn: list[str], postings: DataFrame, all_docs: DataFrame
) -> DataFrame:
    """postings: (term, doc_id[, ...]); all_docs: (doc_id) universe for NOT.
    Returns (doc_id) DataFrame."""

    def term_docs(term: str) -> DataFrame:
        return postings.filter(F.col("term") == term).select("doc_id").distinct()

    stack: list[DataFrame] = []
    for tok in rpn:
        if tok == "and":
            right, left = stack.pop(), stack.pop()
            stack.append(left.join(right, "doc_id", "inner"))
        elif tok == "or":
            right, left = stack.pop(), stack.pop()
            stack.append(left.unionByName(right).distinct())
        elif tok == "not":
            operand = stack.pop()
            stack.append(
                all_docs.select("doc_id").join(operand, "doc_id", "left_anti")
            )
        else:
            stack.append(term_docs(tok))
    if not stack:
        raise ValueError("empty boolean query")
    return stack[-1]


def boolean_search(query: str, postings: DataFrame, all_docs: DataFrame) -> DataFrame:
    return evaluate(to_rpn(tokenize_boolean(query)), postings, all_docs)
