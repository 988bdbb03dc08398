Feature: CallSubquery2

  # Adversarial CALL { } interactions: nesting, UNWIND driving rows,
  # aggregates before/after the call, DISTINCT subqueries, and chained
  # calls sharing imports.

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a', age: 10})-[:T {w: 1}]->(b:P {name: 'b', age: 20}),
             (a)-[:T {w: 2}]->(c:P {name: 'c', age: 30}),
             (b)-[:T {w: 3}]->(c)
      """

  Scenario: Nested correlated CALL
    When executing query:
      """
      MATCH (p:P {name: 'a'})
      CALL { WITH p MATCH (p)-[:T]->(q)
             CALL { WITH q MATCH (q)-[:T]->(r) RETURN count(r) AS deeper }
             RETURN q.name AS qn, deeper }
      RETURN p.name AS n, qn, deeper
      """
    Then the result should be, in any order:
      | n   | qn  | deeper |
      | 'a' | 'b' | 1      |
      | 'a' | 'c' | 0      |
    And no side effects

  Scenario: UNWIND rows drive a correlated CALL over a value variable
    When executing query:
      """
      UNWIND [15, 25] AS cutoff
      CALL { WITH cutoff MATCH (p:P) WHERE p.age > cutoff
             RETURN count(p) AS older }
      RETURN cutoff, older
      """
    Then the result should be, in any order:
      | cutoff | older |
      | 15     | 2     |
      | 25     | 1     |
    And no side effects

  Scenario: Aggregate over the outputs of a row-multiplying CALL
    When executing query:
      """
      MATCH (p:P)
      CALL { WITH p MATCH (p)-[r:T]->() RETURN r.w AS w }
      RETURN p.name AS n, sum(w) AS total
      """
    Then the result should be, in any order:
      | n   | total |
      | 'a' | 3     |
      | 'b' | 3     |
    And no side effects

  Scenario: Two chained calls importing the same variable
    When executing query:
      """
      MATCH (p:P)
      CALL { WITH p MATCH (p)-[:T]->(q) RETURN count(q) AS outs }
      CALL { WITH p MATCH (p)<-[:T]-(q) RETURN count(q) AS ins }
      RETURN p.name AS n, outs, ins
      """
    Then the result should be, in any order:
      | n   | outs | ins |
      | 'a' | 2    | 0   |
      | 'b' | 1    | 1   |
      | 'c' | 0    | 2   |
    And no side effects

  Scenario: A call importing a previous call's output value
    When executing query:
      """
      MATCH (p:P {name: 'a'})
      CALL { WITH p MATCH (p)-[:T]->(q) RETURN max(q.age) AS oldest }
      CALL { WITH oldest MATCH (r:P) WHERE r.age = oldest RETURN r.name AS rn }
      RETURN rn
      """
    Then the result should be, in any order:
      | rn  |
      | 'c' |
    And no side effects

  Scenario: DISTINCT inside a correlated CALL dedupes per input row
    When executing query:
      """
      MATCH (p:P {name: 'a'})
      CALL { WITH p MATCH (p)-[:T]->(q) RETURN DISTINCT q.age > 25 AS old }
      RETURN p.name AS n, old
      """
    Then the result should be, in any order:
      | n   | old   |
      | 'a' | true  |
      | 'a' | false |
    And no side effects

  Scenario: DISTINCT in a correlated CALL collapses equal values per row
    When executing query:
      """
      MATCH (p:P {name: 'a'})
      CALL { WITH p MATCH (p)-[:T]->(q) RETURN DISTINCT q.age > 15 AS old }
      RETURN p.name AS n, old
      """
    Then the result should be, in any order:
      | n   | old  |
      | 'a' | true |
    And no side effects

  Scenario: WITH aggregation before a correlated CALL
    When executing query:
      """
      MATCH (p:P)-[:T]->()
      WITH p, count(*) AS fanout
      CALL { WITH p MATCH (p)-[:T]->(q:P {name: 'c'}) RETURN count(q) AS to_c }
      RETURN p.name AS n, fanout, to_c
      """
    Then the result should be, in any order:
      | n   | fanout | to_c |
      | 'a' | 2      | 1    |
      | 'b' | 1      | 1    |
    And no side effects

  Scenario: Unwound list values stay bound after the call
    When executing query:
      """
      UNWIND ['x', 'y'] AS tag
      CALL { MATCH (p:P {name: 'a'}) RETURN p.age AS age }
      RETURN tag, age
      """
    Then the result should be, in any order:
      | tag | age |
      | 'x' | 10  |
      | 'y' | 10  |
    And no side effects

  Scenario: Mixed aggregate and grouping-key RETURN eliminates zero-match rows
    # grouped aggregate over zero rows yields no groups — the input row
    # 'c' (no outgoing :T) must NOT survive as (qn=null, c=0)
    When executing query:
      """
      MATCH (p:P)
      CALL { WITH p MATCH (p)-[:T]->(q) RETURN q.name AS qn, count(q) AS c }
      RETURN p.name AS n, qn, c
      """
    Then the result should be, in any order:
      | n   | qn  | c |
      | 'a' | 'b' | 1 |
      | 'a' | 'c' | 1 |
      | 'b' | 'c' | 1 |
    And no side effects

  Scenario: All-aggregate RETURN keeps zero-match rows with empty-aggregate values
    When executing query:
      """
      MATCH (p:P)
      CALL { WITH p MATCH (p)-[:T]->(q)
             RETURN count(q) AS c, sum(q.age) AS s, min(q.age) AS m }
      RETURN p.name AS n, c, s, m
      """
    Then the result should be, in any order:
      | n   | c | s  | m    |
      | 'a' | 2 | 50 | 20   |
      | 'b' | 1 | 30 | 30   |
      | 'c' | 0 | 0  | null |
    And no side effects

  Scenario: Composite aggregate expression in correlated CALL RETURN fills through
    # supported since round 7: zero-match folds the empty-aggregate value
    # through the composition (see call_subquery_zero_match.feature)
    When executing query:
      """
      MATCH (p:P)
      CALL { WITH p MATCH (p)-[:T]->(q) RETURN count(q) + 1 AS c }
      RETURN p.name AS n, c
      """
    Then the result should be, in any order:
      | n   | c |
      | 'a' | 3 |
      | 'b' | 2 |
      | 'c' | 1 |
    And no side effects

  Scenario: Intermediate all-aggregate WITH in correlated CALL keeps zero-match rows
    # supported since round 7: per-input-row ungrouped aggregate, filled
    # to 0 on zero matches (see call_subquery_zero_match.feature)
    When executing query:
      """
      MATCH (p:P)
      CALL { WITH p MATCH (p)-[:T]->(q) WITH count(q) AS c RETURN c }
      RETURN p.name AS n, c
      """
    Then the result should be, in any order:
      | n   | c |
      | 'a' | 2 |
      | 'b' | 1 |
      | 'c' | 0 |
    And no side effects

  Scenario: Intermediate WITH with a user grouping key keeps per-row semantics
    When executing query:
      """
      MATCH (p:P)
      CALL { WITH p MATCH (p)-[:T]->(q)
             WITH q.name AS qn, sum(q.age) AS s WHERE s > 15 RETURN qn, s }
      RETURN p.name AS n, qn, s
      """
    Then the result should be, in any order:
      | n   | qn  | s  |
      | 'a' | 'b' | 20 |
      | 'a' | 'c' | 30 |
      | 'b' | 'c' | 30 |
    And no side effects
