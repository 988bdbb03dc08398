Feature: CallSubquery

  # CALL { [WITH imports] ... RETURN ... } (planner.plan_call_subquery) —
  # beyond reference parity (the reference has no subqueries). Set-based
  # per-row semantics: correlated calls plan once against the DISTINCT
  # import binding and join back; imports become implicit grouping keys
  # of inner aggregates; an aggregating subquery keeps zero-match rows
  # (count/sum -> 0, collect -> []); a row-returning subquery with no
  # rows eliminates the input row.

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a', age: 10})-[:T]->(b:P {name: 'b', age: 20}),
             (a)-[:T]->(c:P {name: 'c', age: 30}),
             (b)-[:T]->(c)
      """

  Scenario: Correlated aggregate per input row
    When executing query:
      """
      MATCH (p:P)
      CALL { WITH p MATCH (p)-[:T]->(q) RETURN count(q) AS deg }
      RETURN p.name AS n, deg
      """
    Then the result should be, in any order:
      | n   | deg |
      | 'a' | 2   |
      | 'b' | 1   |
      | 'c' | 0   |
    And no side effects

  Scenario: Zero-match aggregate rows are kept with empty-aggregate values
    When executing query:
      """
      MATCH (p:P {name: 'c'})
      CALL { WITH p MATCH (p)-[:T]->(q)
             RETURN count(q) AS c, sum(q.age) AS s, collect(q.name) AS l,
                    max(q.age) AS m }
      RETURN p.name AS n, c, s, l, m
      """
    Then the result should be, in any order:
      | n   | c | s | l  | m    |
      | 'c' | 0 | 0 | [] | null |
    And no side effects

  Scenario: Row-returning subquery multiplies rows
    When executing query:
      """
      MATCH (p:P {name: 'a'})
      CALL { WITH p MATCH (p)-[:T]->(q) RETURN q.name AS qn }
      RETURN p.name AS n, qn
      """
    Then the result should be, in any order:
      | n   | qn  |
      | 'a' | 'b' |
      | 'a' | 'c' |
    And no side effects

  Scenario: Row-returning subquery with no rows eliminates the input row
    When executing query:
      """
      MATCH (p:P)
      CALL { WITH p MATCH (p)-[:T]->(q:P {name: 'c'}) RETURN q.name AS qn }
      RETURN p.name AS n
      """
    Then the result should be, in any order:
      | n   |
      | 'a' |
      | 'b' |
    And no side effects

  Scenario: Uncorrelated subquery cross-joins its result
    When executing query:
      """
      MATCH (p:P {name: 'a'})
      CALL { MATCH (x:P) RETURN max(x.age) AS oldest }
      RETURN p.name AS n, oldest
      """
    Then the result should be, in any order:
      | n   | oldest |
      | 'a' | 30     |
    And no side effects

  Scenario: A returned node stays a node for later clauses
    When executing query:
      """
      CALL { MATCH (p:P {name: 'a'}) RETURN p }
      MATCH (p)-[:T]->(q)
      RETURN q.name AS qn
      """
    Then the result should be, in any order:
      | qn  |
      | 'b' |
      | 'c' |
    And no side effects

  Scenario: CALL as the first clause drives the query
    When executing query:
      """
      CALL { MATCH (p:P) RETURN p.age AS age ORDER BY age DESC LIMIT 2 }
      RETURN sum(age) AS s
      """
    Then the result should be, in any order:
      | s  |
      | 50 |
    And no side effects

  Scenario: Returning an imported variable reuses the outer binding
    When executing query:
      """
      MATCH (p:P {name: 'a'})
      CALL { WITH p MATCH (p)-[:T]->(q) RETURN p, count(q) AS deg }
      RETURN p.name AS n, deg
      """
    Then the result should be, in any order:
      | n   | deg |
      | 'a' | 2   |
    And no side effects

  Scenario: Inner WITH chains are allowed
    When executing query:
      """
      MATCH (p:P {name: 'a'})
      CALL { WITH p
             MATCH (p)-[:T]->(q)
             WITH q WHERE q.age > 15
             RETURN count(q) AS big }
      RETURN big
      """
    Then the result should be, in any order:
      | big |
      | 2   |
    And no side effects

  Scenario: Uncorrelated UNION inside CALL unions branch outputs
    When executing query:
      """
      CALL { MATCH (x:P) RETURN x.name AS n
             UNION
             MATCH (y:P) WHERE y.age > 15 RETURN y.name AS n }
      RETURN n
      """
    Then the result should be, in any order:
      | n   |
      | 'a' |
      | 'b' |
      | 'c' |
    And no side effects

  Scenario: UNION ALL inside CALL keeps duplicates
    When executing query:
      """
      CALL { MATCH (x:P {name: 'a'}) RETURN x.age AS v
             UNION ALL
             MATCH (y:P {name: 'a'}) RETURN y.age AS v }
      RETURN count(*) AS c, sum(v) AS s
      """
    Then the result should be, in any order:
      | c | s  |
      | 2 | 20 |
    And no side effects

  Scenario: Correlated UNION inside CALL is rejected
    When executing query:
      """
      MATCH (p:P)
      CALL { WITH p MATCH (p)-[:T]->(q) RETURN q.name AS n
             UNION
             MATCH (y:P) RETURN y.name AS n }
      RETURN n
      """
    Then a SyntaxError should be raised

  Scenario: Correlated ORDER BY + LIMIT paginates per input row
    When executing query:
      """
      MATCH (p:P)
      CALL { WITH p MATCH (p)-[:T]->(q)
             RETURN q.name AS qn ORDER BY q.age DESC LIMIT 1 }
      RETURN p.name AS n, qn
      """
    Then the result should be, in any order:
      | n   | qn  |
      | 'a' | 'c' |
      | 'b' | 'c' |
    And no side effects

  Scenario: Correlated SKIP past the first match per row
    When executing query:
      """
      MATCH (p:P {name: 'a'})
      CALL { WITH p MATCH (p)-[:T]->(q)
             RETURN q.name AS qn ORDER BY q.age DESC SKIP 1 }
      RETURN qn
      """
    Then the result should be, in any order:
      | qn  |
      | 'b' |
    And no side effects

  Scenario: Per-row LIMIT on an intermediate WITH is rejected
    When executing query:
      """
      MATCH (p:P)
      CALL { WITH p MATCH (p)-[:T]->(q)
             WITH q LIMIT 1
             RETURN q.name AS qn }
      RETURN p.name AS n, qn
      """
    Then a SyntaxError should be raised

  Scenario: Output name collision is rejected
    When executing query:
      """
      MATCH (p:P)
      CALL { MATCH (x:P) RETURN x AS p }
      RETURN p
      """
    Then a SyntaxError should be raised

  Scenario: Procedure CALL dispatches to the registry
    # supported since round 8 (call_procedure.feature covers the surface);
    # an unknown procedure is the remaining clean error
    When executing query:
      """
      CALL db.labels() YIELD label RETURN label
      """
    Then the result should be, in any order:
      | label |
      | 'P'   |
    And no side effects

  Scenario: Unknown procedure CALL is a clean error
    When executing query:
      """
      CALL not.a.procedure() YIELD x RETURN x
      """
    Then a SyntaxError should be raised
