Feature: UnionAndScoping

  # Round-7 corpus growth, part 4: UNION dedup semantics with nulls and
  # duplicates, parameter-driven edges, WITH scoping, and alias shadowing.

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'a', age: 10}), (:P {name: 'b', age: 20}),
             (:Q {name: 'a', age: 10})
      """

  Scenario: UNION deduplicates identical rows across branches
    When executing query:
      """
      MATCH (p:P) RETURN p.name AS n, p.age AS a
      UNION
      MATCH (q:Q) RETURN q.name AS n, q.age AS a
      """
    Then the result should be, in any order:
      | n   | a  |
      | 'a' | 10 |
      | 'b' | 20 |
    And no side effects

  Scenario: UNION ALL keeps duplicates across branches
    When executing query:
      """
      MATCH (p:P) RETURN p.name AS n
      UNION ALL
      MATCH (q:Q) RETURN q.name AS n
      """
    Then the result should be, in any order:
      | n   |
      | 'a' |
      | 'b' |
      | 'a' |
    And no side effects

  Scenario: UNION treats null rows as equal for dedup
    When executing query:
      """
      RETURN null AS x
      UNION
      RETURN null AS x
      """
    Then the result should be, in any order:
      | x    |
      | null |
    And no side effects

  Scenario: Parameters flow through WHERE and projections
    When executing query:
      """
      MATCH (p:P) WHERE p.age > $cut RETURN p.name AS n, $tag AS tag
      """
    And parameters are:
      | cut | 15    |
      | tag | 'old' |
    Then the result should be, in any order:
      | n   | tag   |
      | 'b' | 'old' |
    And no side effects

  Scenario: Null parameter in arithmetic propagates
    When executing query:
      """
      RETURN $x + 1 AS a
      """
    And parameters are:
      | x | null |
    Then the result should be, in any order:
      | a    |
      | null |
    And no side effects

  Scenario: WITH alias shadows the original variable name
    When executing query:
      """
      MATCH (p:P {name: 'a'})
      WITH p.age AS p
      RETURN p + 1 AS q
      """
    Then the result should be, in any order:
      | q  |
      | 11 |
    And no side effects

  Scenario: WITH arithmetic feeds a later WHERE
    When executing query:
      """
      MATCH (p:P)
      WITH p, p.age * 2 AS double
      WHERE double > 25
      RETURN p.name AS n, double
      """
    Then the result should be, in any order:
      | n   | double |
      | 'b' | 40     |
    And no side effects

  Scenario: Chained WITHs narrow scope
    When executing query:
      """
      MATCH (p:P)
      WITH p.name AS n, p.age AS a
      WITH n
      RETURN n
      """
    Then the result should be, in any order:
      | n   |
      | 'a' |
      | 'b' |
    And no side effects

  Scenario: Referencing a variable dropped by WITH is an error
    When executing query:
      """
      MATCH (p:P)
      WITH p.name AS n
      RETURN p.age AS a
      """
    Then a SyntaxError should be raised at compile time: UndefinedVariable
