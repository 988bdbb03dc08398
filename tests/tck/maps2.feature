Feature: Maps2

  Scenario: Literal map field access
    Given any graph
    When executing query:
      """
      RETURN {a: 1, b: 'x'}.a AS a, {a: 1, b: 'x'}.b AS b
      """
    Then the result should be, in any order:
      | a | b   |
      | 1 | 'x' |
    And no side effects

  Scenario: Missing map key is null
    Given any graph
    When executing query:
      """
      WITH {a: 1} AS m RETURN m.zzz AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |
    And no side effects

  Scenario: Nested map access
    Given any graph
    When executing query:
      """
      RETURN {outer: {inner: 7}}.outer.inner AS v
      """
    Then the result should be, in any order:
      | v |
      | 7 |
    And no side effects

  Scenario: Map inside a list
    Given any graph
    When executing query:
      """
      RETURN [{v: 1}, {v: 2}][1].v AS v
      """
    Then the result should be, in any order:
      | v |
      | 2 |
    And no side effects

  Scenario: keys of a literal map
    Given any graph
    When executing query:
      """
      WITH {b: 1, a: 2} AS m
      UNWIND keys(m) AS k
      RETURN k ORDER BY k
      """
    Then the result should be, in order:
      | k   |
      | 'a' |
      | 'b' |
    And no side effects

  Scenario: Map projection with property selector
    Given an empty graph
    And having executed:
      """
      CREATE (:Person {name: 'Ann', age: 40, city: 'Rome'})
      """
    When executing query:
      """
      MATCH (p:Person) RETURN p {.name, .age} AS m
      """
    Then the result should be, in any order:
      | m                       |
      | {name: 'Ann', age: 40} |
    And no side effects

  Scenario: Map projection with computed entry
    Given an empty graph
    And having executed:
      """
      CREATE (:Person {name: 'Ann', age: 40})
      """
    When executing query:
      """
      MATCH (p:Person) RETURN p {.name, next: p.age + 1} AS m
      """
    Then the result should be, in any order:
      | m                        |
      | {name: 'Ann', next: 41} |
    And no side effects

  Scenario: properties() of a node equals its map
    Given an empty graph
    And having executed:
      """
      CREATE (:Thing {a: 1, b: 'x'})
      """
    When executing query:
      """
      MATCH (t:Thing) RETURN properties(t) AS m
      """
    Then the result should be, in any order:
      | m               |
      | {a: 1, b: 'x'} |
    And no side effects
