Feature: ClauseInteractions3

  # Round-8 interaction families targeting where r7's bugs clustered
  # (cross-clause lowering): pattern comprehensions / COUNT{} / varpath
  # renders inside CASE, list literals, ORDER BY, CALL imports and
  # quantifiers; aggregates of path expressions. Every expectation is
  # hand-derived from the fixture: edges a->b(w1), a->c(w2), b->c(w3),
  # c->d(w4); ages a10 b20 c30 d40.

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a', age: 10})-[:T {w: 1}]->(b:P {name: 'b', age: 20}),
             (a)-[:T {w: 2}]->(c:P {name: 'c', age: 30}),
             (b)-[:T {w: 3}]->(c),
             (c)-[:T {w: 4}]->(d:P {name: 'd', age: 40})
      """

  Scenario: Pattern comprehension size inside CASE
    When executing query:
      """
      MATCH (p:P)
      RETURN p.name AS n,
             CASE WHEN size([(p)-[:T]->(q) | q.name]) > 1
                  THEN 'hub' ELSE 'leaf' END AS kind
      """
    Then the result should be, in any order:
      | n   | kind   |
      | 'a' | 'hub'  |
      | 'b' | 'leaf' |
      | 'c' | 'leaf' |
      | 'd' | 'leaf' |
    And no side effects

  Scenario: Pattern comprehension sizes inside a list literal
    When executing query:
      """
      MATCH (p:P {name: 'a'})
      RETURN [size([(p)-[:T]->(x) | x]), size([(p)<-[:T]-(y) | y])] AS counts
      """
    Then the result should be, in any order:
      | counts |
      | [2, 0] |
    And no side effects

  Scenario: COUNT subquery as a simple CASE operand
    When executing query:
      """
      MATCH (p:P)
      RETURN p.name AS n,
             CASE COUNT {(p)-[:T]->()}
               WHEN 2 THEN 'two' WHEN 1 THEN 'one' ELSE 'zero' END AS c
      """
    Then the result should be, in any order:
      | n   | c      |
      | 'a' | 'two'  |
      | 'b' | 'one'  |
      | 'c' | 'one'  |
      | 'd' | 'zero' |
    And no side effects

  Scenario: reduce over a list of COUNT subqueries
    When executing query:
      """
      MATCH (p:P {name: 'a'})
      RETURN reduce(acc = 0,
                    x IN [COUNT {(p)-->()}, COUNT {(p)<--()}] | acc + x) AS tot
      """
    Then the result should be, in any order:
      | tot |
      | 2   |
    And no side effects

  Scenario: Pattern comprehension inside a correlated CALL subquery
    When executing query:
      """
      MATCH (p:P)
      CALL { WITH p RETURN size([(p)-[:T]->(q) | q]) AS deg }
      RETURN p.name AS n, deg
      """
    Then the result should be, in any order:
      | n   | deg |
      | 'a' | 2   |
      | 'b' | 1   |
      | 'c' | 1   |
      | 'd' | 0   |
    And no side effects

  Scenario: COUNT subquery threaded through an intermediate CALL WITH
    When executing query:
      """
      MATCH (p:P)
      CALL { WITH p WITH p, COUNT {(p)-->()} AS deg RETURN deg }
      RETURN p.name AS n, deg
      """
    Then the result should be, in any order:
      | n   | deg |
      | 'a' | 2   |
      | 'b' | 1   |
      | 'c' | 1   |
      | 'd' | 0   |
    And no side effects

  Scenario: Var-length path length inside CASE
    When executing query:
      """
      MATCH p = (a:P {name: 'a'})-[:T*1..2]->(x)
      RETURN x.name AS n,
             CASE WHEN length(p) = 1 THEN 'direct' ELSE 'hop' END AS k
      """
    Then the result should be, in any order:
      | n   | k        |
      | 'b' | 'direct' |
      | 'c' | 'direct' |
      | 'c' | 'hop'    |
      | 'd' | 'hop'    |
    And no side effects

  Scenario: Aggregates of var-length path lengths
    When executing query:
      """
      MATCH p = (a:P {name: 'a'})-[:T*1..3]->(x)
      RETURN x.name AS n, min(length(p)) AS d, count(*) AS c
      """
    Then the result should be, in any order:
      | n   | d | c |
      | 'b' | 1 | 1 |
      | 'c' | 1 | 2 |
      | 'd' | 2 | 2 |
    And no side effects

  Scenario: nodes(p) rendered through a list comprehension
    When executing query:
      """
      MATCH p = (a:P {name: 'a'})-[:T*2..2]->(x)
      RETURN x.name AS n, [q IN nodes(p) | q.name] AS names
      """
    Then the result should be, in any order:
      | n   | names           |
      | 'c' | ['a', 'b', 'c'] |
      | 'd' | ['a', 'c', 'd'] |
    And no side effects

  Scenario: UNWIND over a pattern comprehension feeding an aggregate
    When executing query:
      """
      MATCH (p:P {name: 'a'})
      UNWIND [(p)-[:T]->(q) | q.age] AS qa
      RETURN sum(qa) AS s
      """
    Then the result should be, in any order:
      | s  |
      | 50 |
    And no side effects

  Scenario: Quantifiers over pattern comprehension lists
    When executing query:
      """
      MATCH (p:P {name: 'a'})
      RETURN all(x IN [(p)-[:T]->(q) | q.age] WHERE x > 15) AS a,
             any(x IN [(p)-[:T]->(q) | q.age] WHERE x > 25) AS b,
             none(x IN [(p)-[:T]->(q) | q.age] WHERE x > 35) AS c,
             single(x IN [(p)-[:T]->(q) | q.age] WHERE x = 20) AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | true | true | true | true |
    And no side effects

  Scenario: Pattern comprehension size in ORDER BY
    When executing query:
      """
      MATCH (p:P)
      RETURN p.name AS n
      ORDER BY size([(p)-[:T]->(x) | x]) DESC, n
      """
    Then the result should be, in order:
      | n   |
      | 'a' |
      | 'b' |
      | 'c' |
      | 'd' |
    And no side effects

  Scenario: COUNT subquery in WHERE
    When executing query:
      """
      MATCH (p:P) WHERE COUNT {(p)-[:T]->()} >= 1
      RETURN p.name AS n
      """
    Then the result should be, in any order:
      | n   |
      | 'a' |
      | 'b' |
      | 'c' |
    And no side effects

  Scenario: CASE inside the pattern comprehension projection
    When executing query:
      """
      MATCH (p:P {name: 'a'})
      RETURN [(p)-[:T]->(q) |
              CASE WHEN q.age > 25 THEN 'old' ELSE 'young' END] AS tags
      """
    Then the result should be, in any order (ignoring element order for lists):
      | tags             |
      | ['young', 'old'] |
    And no side effects

  Scenario: COUNT subquery with an inner WHERE
    When executing query:
      """
      MATCH (p:P)
      RETURN p.name AS n, COUNT {(p)-[:T]->(q) WHERE q.age > 25} AS c
      """
    Then the result should be, in any order:
      | n   | c |
      | 'a' | 1 |
      | 'b' | 1 |
      | 'c' | 1 |
      | 'd' | 0 |
    And no side effects

  Scenario: shortestPath length as a CASE operand
    When executing query:
      """
      MATCH p = shortestPath((a:P {name: 'a'})-[:T*1..3]->(d:P {name: 'd'}))
      RETURN CASE length(p) WHEN 2 THEN 'two' ELSE 'other' END AS k
      """
    Then the result should be, in any order:
      | k     |
      | 'two' |
    And no side effects

  Scenario: Sum over fixed-length named path lengths
    When executing query:
      """
      MATCH p = (x:P)-[:T]->(y:P)
      RETURN sum(length(p)) AS s
      """
    Then the result should be, in any order:
      | s |
      | 4 |
    And no side effects

  Scenario: Var-length named path filtered in a later WITH
    When executing query:
      """
      MATCH p = (a:P {name: 'a'})-[:T*1..2]->(x)
      WITH p, x WHERE length(p) = 2
      RETURN x.name AS n
      """
    Then the result should be, in any order:
      | n   |
      | 'c' |
      | 'd' |
    And no side effects

  Scenario: Pattern comprehension over two bound endpoints
    When executing query:
      """
      MATCH (a:P {name: 'a'}), (c:P {name: 'c'})
      RETURN size([(a)-[:T]->(m)-[:T]->(c) | m]) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |
    And no side effects

  Scenario: Pattern comprehension under OPTIONAL MATCH null guard
    When executing query:
      """
      MATCH (d:P {name: 'd'})
      OPTIONAL MATCH (d)-[:T]->(x)
      RETURN CASE WHEN x IS NULL
                  THEN size([(d)<-[:T]-(y) | y]) ELSE -1 END AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |
    And no side effects
